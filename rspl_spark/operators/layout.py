"""Multi-dimensional data layout: Z-order (Morton) clustering.

Single-column range sort gives parquet row-group skipping on ONE
predicate column (tests/test_scale_patterns.py). Real workloads filter
on several — date AND customer, source AND quality band — and a layout
sorted on column A reads everything for a column-B predicate. Z-order
interleaves the bits of several bucketized sort keys so rows close in
ANY dimension land close in the file order: every participating
column's row-group min/max stats stay narrow, and predicates on any
subset of the dimensions skip row groups.

All of it is codegen'd column expressions + one repartitionByRange —
no UDFs, no shuffle beyond the single range exchange any sorted write
needs, and the cost is O(n) independent of which dimension later gets
filtered. At 100 TB this is the lever that turns "scan the month" into
"scan the month AND the tenant" without a second copy of the data.
(Morton 1966 interleaving; the technique is standard in modern
lakehouse table formats.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, mn: int, mx: int, buckets: int) -> Column:
    """Linear bucket of an integer column into [0, buckets):
    ``floor((v - mn) * buckets / span)``. The double division is exact
    for any realistic key range (products stay far under 2^53), so an
    independent engine reproduces the exact bucket ids. mn/mx come from
    table stats (one tiny agg)."""
    span = max(int(mx) - int(mn) + 1, 1)
    return F.floor(
        ((col.cast("long") - F.lit(int(mn))) * F.lit(int(buckets))) / F.lit(span)
    ).cast("long")


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton key: interleave the low ``bits`` bits of each (already
    bucketized) column. Bit j of column i lands at position
    ``j * n_cols + i``; bit positions are disjoint so plain addition
    assembles the key. Pure codegen — n_cols * bits shift/mask terms."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long key")
    terms = []
    for i, c in enumerate(cols):
        ci = c.cast("long")
        for j in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(ci, j).bitwiseAND(F.lit(1)), j * n + i)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """The same Morton key as DuckDB SQL — oracle mirror of
    :func:`zorder_key` (same disjoint-bit addition, same positions)."""
    n = len(cols)
    terms = [
        f"((({c} >> {j}) & 1) << {j * n + i})"
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> DataFrame:
    """Return ``df`` arranged for a Z-ordered write: bucketize each
    layout column against its observed min/max (one scalar agg — the
    stats any table catalog already has), compute the Morton key, range
    partition + sort by it, and drop the helper column. Write the
    result with ``.write.parquet(...)``; the key orders the data, it is
    not stored."""
    # normalize every layout column to an integer expression FIRST, so
    # the driver-side stats are ints whatever the column type — the
    # module's own motivating example is (order DATE, custkey), and
    # int(datetime.date) raised before this normalization
    by_name = dict(df.dtypes)
    norm: dict[str, Column] = {}
    for c in cols:
        t = by_name[c]
        col = F.col(c)
        if t == "date":
            norm[c] = F.unix_date(col)
        elif t.startswith("timestamp"):
            norm[c] = F.unix_micros(col)
        elif t in ("tinyint", "smallint", "int", "bigint") or t.startswith(
            ("decimal", "double", "float")
        ):
            norm[c] = col.cast("long")  # fractional types truncate
        else:
            raise ValueError(
                f"zorder_layout: column {c!r} has non-orderable-to-int "
                f"type {t}; cast it to a numeric/date/timestamp first"
            )
    aggs = []
    for c in cols:
        aggs += [F.min(norm[c]).alias(f"mn_{c}"), F.max(norm[c]).alias(f"mx_{c}")]
    stats = df.agg(*aggs).first()
    for c in cols:
        if stats[f"mn_{c}"] is None or stats[f"mx_{c}"] is None:
            raise ValueError(
                f"zorder_layout: column {c!r} has no non-null values "
                "(empty input or all-null column) — cannot derive bucket range"
            )
    buckets = 1 << bits
    keyed = df.withColumn(
        "_zkey",
        zorder_key(
            [
                bucketize(norm[c], stats[f"mn_{c}"], stats[f"mx_{c}"], buckets)
                for c in cols
            ],
            bits,
        ),
    )
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
