"""Multimodal plumbing tests: schema, Arrow batching, payload/metadata
pruning. Codecs are stubbed (deterministic fake) — the Spark-side
machinery is what's under test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rspl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_stub,
    extract_features,
    fake_image_decode,
    frame_sample_plan,
    media_stats,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([i % 256]) * (100 + i)
        meta = (64 + i, 48 + i, 16000 if kind == "audio" else None, 90 if kind == "video" else None, kind[:3])
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_schema_roundtrip(spark, media, tmp_path):
    """binary + struct metadata survive a parquet roundtrip intact."""
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.schema == MEDIA_SCHEMA
    orig = {r["media_id"]: r["payload"] for r in media.collect()}
    got = {r["media_id"]: r["payload"] for r in back.collect()}
    assert got == orig


def test_extract_features_deterministic(spark, media):
    feats = extract_features(media, decode=fake_image_decode)
    rows1 = {r["media_id"]: (r["feature"], r["feat_dim"]) for r in feats.collect()}
    rows2 = {r["media_id"]: (r["feature"], r["feat_dim"]) for r in feats.collect()}
    assert rows1 == rows2
    assert len(rows1) == 30
    assert all(dim == 256 for _, dim in rows1.values())  # 4 hex sha256 blocks
    # features must depend on payload: all distinct payloads → distinct feats
    assert len({f for f, _ in rows1.values()}) == 30


def test_extract_features_preserves_partitioning(spark, media):
    """mapInPandas is narrow: input partitioning is preserved (no shuffle
    before the decode at scale)."""
    m4 = media.repartition(4)
    feats = extract_features(m4, decode=fake_image_decode)
    assert feats.rdd.getNumPartitions() == 4
    plan = feats._jdf.queryExecution().executedPlan().toString()
    # every Exchange in the (AQE-duplicated) plan text is the explicit
    # round-robin repartition — mapInPandas itself adds no shuffle
    assert plan.count("Exchange") == plan.count("Exchange RoundRobinPartitioning")


def test_decode_stub_contract(spark, media):
    with pytest.raises(Exception) as ei:
        extract_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)


def test_frame_sampling_metadata_only(spark, media, tmp_path):
    p = str(tmp_path / "media_fs.parquet")
    media.write.parquet(p)
    frames = frame_sample_plan(spark.read.parquet(p), every_n=30)
    got = frames.groupBy("media_id").count().collect()
    # videos have n_frames=90 → indices 0,30,60 = 3 samples each
    assert all(r["count"] == 3 for r in got)
    assert len(got) == 10
    # pruning: the parquet scan must not read payload bytes
    plan = frames._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1]
    assert "payload" not in read_schema


def test_media_stats_prunes_payload(spark, media, tmp_path):
    p = str(tmp_path / "media2.parquet")
    media.write.parquet(p)
    stats = media_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1]
    assert "payload" not in read_schema
    rows = {r["kind"]: r["n"] for r in stats.collect()}
    assert rows == {"image": 10, "audio": 10, "video": 10}

def test_resize_composes_with_features(spark, media):
    """resize is schema-preserving: meta dims updated, audio untouched,
    and the output feeds extract_features unchanged."""
    from rspl_spark.operators.multimodal import fake_resize, resize_media

    resized = resize_media(media, 32, 24, kernel=fake_resize)
    assert resized.schema == MEDIA_SCHEMA
    rows = {r["media_id"]: r for r in resized.collect()}
    orig = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        if r["kind"] in ("image", "video"):
            assert (r["meta"]["width"], r["meta"]["height"]) == (32, 24)
            assert r["payload"] != orig[mid]["payload"]
            assert len(r["payload"]) == 64  # sha256 hex digest bytes
        else:
            assert r["payload"] == orig[mid]["payload"]
            assert r["meta"]["width"] == orig[mid]["meta"]["width"]
    # composes: features over resized media still one narrow pipeline
    feats = extract_features(resized, decode=fake_image_decode)
    assert feats.count() == 30


def test_resize_stub_contract(spark, media):
    from rspl_spark.operators.multimodal import resize_media

    with pytest.raises(Exception) as ei:
        resize_media(media, 8, 8).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)
