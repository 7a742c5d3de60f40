"""Time-window aggregations (SURVEY.md §2.2 "Streaming"): tumbling,
sliding, session windows + watermark-based late-data handling.

These are thin, tested wrappers over the built-in ``window`` /
``session_window`` functions — the windowing itself is Catalyst-native and
streaming-safe (incremental partial aggregation; state store holds only
open windows). The same call works on batch and streaming DataFrames;
tests exploit that by checking streaming output ≡ batch output.

Watermarks: the reference has no late-data notion (arrival order IS the
semantics, SURVEY.md §2.3); watermarking is capability closure from the
north star. Per the late-tail rule (src/lib.rs:256-260) stateless ops
never get a watermark — only windowed aggs do, and only in streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agged(grouped, aggs: dict[str, Column]) -> DataFrame:
    return grouped.agg(*[c.alias(name) for name, c in aggs.items()])


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping windows of ``duration`` (e.g. "10 minutes")."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.window(ts_col, duration), *(keys or []))
    out = _agged(g, aggs)
    return out.select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        *(keys or []),
        *aggs.keys(),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: ``duration`` long, advancing every ``slide``."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.window(ts_col, duration, slide), *(keys or []))
    out = _agged(g, aggs)
    return out.select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        *(keys or []),
        *aggs.keys(),
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sessions close after ``gap`` of inactivity per key."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.session_window(ts_col, gap), *(keys or []))
    out = _agged(g, aggs)
    return out.select(
        F.col("session_window.start").alias("sess_start"),
        F.col("session_window.end").alias("sess_end"),
        *(keys or []),
        *aggs.keys(),
    )
