"""Local stand-in for the driver's correctness gate.

Runs each registered query in Spark AND its oracle SQL in DuckDB on the same
parquet tables, then compares: row count, column names (sorted), and an
order-insensitive value hash (floats rounded to 6 decimals, rows
canonically sorted).

Usage: python tools/check_oracle.py [--json OUT.json] [--resume]
           [--no-oracle q1,q2] [sf_dir] [query ...]

With --json, per-query status ("pass"/"okNA"/"fail"), rows, seconds,
and failure detail are also written as one JSON document (flushed
incrementally) — the shape committed as docs/bench/r*_sweep artifacts.
--resume reloads OUT.json and skips queries already recorded pass/okNA
(fails rerun). --no-oracle runs only the Spark side for the named
queries, recording an explicit oracle exclusion — for scales where the
DuckDB twin is intractable (e.g. an O(n^2) cross-join oracle at sf1).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspl_spark.catalog import TABLES  # noqa: E402
from rspl_spark.queries import load_registry  # noqa: E402
from rspl_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            try:
                if df[c].dtype == object:
                    df[c] = df[c].astype(str)
            except Exception:
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    resume = "--resume" in argv
    if resume:
        argv.remove("--resume")
    no_oracle: set[str] = set()
    if "--no-oracle" in argv:
        i = argv.index("--no-oracle")
        no_oracle = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    skip: set[str] = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}
    if resume and json_out and os.path.isfile(json_out):
        with open(json_out) as f:
            prior = json.load(f).get("queries", {})
        records = {
            k: v for k, v in prior.items() if v.get("status") != "fail"
        }
        print(f"# resume: {len(records)} prior results kept, "
              f"{sum(1 for v in prior.values() if v.get('status') == 'fail')} "
              "fails will rerun")
    reg = load_registry()
    con = duckdb.connect()
    # spill OUTSIDE the repo: a memory-pressured oracle (sf1 pagerank
    # twin) otherwise drops multi-GB duckdb_temp_storage-*.tmp files
    # into ./.tmp, which the r14 end-of-round snapshot then committed
    # (7.4 GB of dead weight in git history — ADVICE r14, high)
    duck_tmp = os.path.join("/tmp", "rspl_duckdb_spill")
    os.makedirs(duck_tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{duck_tmp}'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark("oracle-check")
    # untimed warm-up (same rationale as bench.py): session startup,
    # parquet footers, and codegen JIT otherwise land on whichever query
    # sorts first and read as a 5-10x outlier in the per-query timings
    reg["q1_pricing_summary"].fn(spark, sf_dir).collect()
    # honest per-status ledger: hash-verified passes are NOT the same
    # claim as okNA (no oracle, rows-only) or excluded (oracle
    # intractable at this scale) — r14's sf1 artifact said "227 pass"
    # when 223 hash-passed + 4 were excluded, and SCALE.md inherited
    # the ambiguity. Counts are derived from the records dict so a
    # --resume over a subset still reports the WHOLE artifact.
    def _counts() -> dict[str, int]:
        c = {"pass": 0, "okNA": 0, "excluded": 0, "fail": 0}
        for v in records.values():
            c[v["status"]] = c.get(v["status"], 0) + 1
        return c

    def _flush() -> None:
        if json_out is None:
            return
        c = _counts()
        doc = {
            "sf_dir": sf_dir,
            "n_pass": c["pass"],
            "n_okNA": c["okNA"],
            "n_excluded": c["excluded"],
            "n_fail": c["fail"],
            "n_total": len(records),
            "queries": records,
        }
        tmp = json_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.replace(tmp, json_out)

    for name, spec in sorted(reg.items()):
        if only and name not in only:
            continue
        if name in records:  # --resume: already verified this run file
            continue
        if name in skip:
            print(f"SKIP {name}: excluded at this scale (--skip)")
            records[name] = {
                "status": "excluded",
                "detail": "query excluded at this scale (--skip): both "
                          "engine and oracle are deliberately brute-force "
                          "at gate scale; the blocked/indexed variants are "
                          "the scale path",
            }
            _flush()
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:400]}")
            records[name] = {
                "status": "fail",
                "sec": round(time.time() - t0, 1),
                "detail": f"SPARK ERROR {type(e).__name__}: {str(e)[:400]}",
            }
            _flush()
            continue
        if name in no_oracle:
            print(f"EXCL {name}: rows={len(sdf)} (oracle excluded at this "
                  f"scale) [{time.time()-t0:.1f}s]")
            records[name] = {
                "status": "excluded",
                "rows": len(sdf),
                "sec": round(time.time() - t0, 1),
                "detail": "oracle excluded at this scale (--no-oracle): "
                          "DuckDB twin intractable; Spark side ran, row "
                          "count recorded",
            }
            _flush()
            continue
        if spec.oracle is None:
            print(f"okNA {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            records[name] = {
                "status": "okNA",
                "rows": len(sdf),
                "sec": round(time.time() - t0, 1),
            }
            _flush()
            continue
        try:
            ddf = con.sql(spec.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:400]}")
            records[name] = {
                "status": "fail",
                "sec": round(time.time() - t0, 1),
                "detail": f"DUCKDB ERROR {type(e).__name__}: {str(e)[:400]}",
            }
            _flush()
            continue
        cs, cd = canon(sdf), canon(ddf)
        problems = []
        if len(cs) != len(cd):
            problems.append(f"rowcount spark={len(cs)} duck={len(cd)}")
        if list(cs.columns) != list(cd.columns):
            problems.append(f"cols spark={list(cs.columns)} duck={list(cd.columns)}")
        if not problems and value_hash(cs) != value_hash(cd):
            diff_cols = []
            for c in cs.columns:
                if not cs[c].equals(cd[c]):
                    diff_cols.append(c)
            ex = ""
            for c in diff_cols[:2]:
                neq = cs[c] != cd[c]
                i = neq.idxmax()
                ex += f" [{c}@{i}: spark={cs[c][i]!r} duck={cd[c][i]!r}]"
            problems.append(f"hash mismatch cols={diff_cols}{ex}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            records[name] = {
                "status": "fail",
                "sec": round(time.time() - t0, 1),
                "detail": "; ".join(problems)[:600],
            }
        else:
            print(f"PASS {name}: rows={len(cs)} [{time.time()-t0:.1f}s]")
            records[name] = {
                "status": "pass",
                "rows": len(cs),
                "sec": round(time.time() - t0, 1),
            }
        _flush()
    c = _counts()
    print(f"\n{c['pass']} pass, {c['okNA']} okNA, {c['excluded']} excluded, "
          f"{c['fail']} fail")
    return 1 if c["fail"] else 0


if __name__ == "__main__":
    sys.exit(main())
