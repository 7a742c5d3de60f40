"""Similarity kernels: the expression-based cosine (JVM/codegen — the
default) and an Arrow-vectorized pandas-UDF variant (the escape hatch for
kernels built-ins can't express, e.g. learned metrics; SURVEY §2.2
"embedding similarity … or a vectorized Pandas UDF").

Prefer the expression form: it stays inside whole-stage codegen with zero
Python. The pandas-UDF form processes Arrow batches with numpy — still
~10-100x faster than row-at-a-time Python, and the template to copy for
custom scoring functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def cosine_expr(a: Column, b: Column) -> Column:
    """Codegen'd cosine over two array<float/double> columns (double math)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda s, v: s + v * v))
    # NULLIF guard: under ANSI mode (Spark 4 default) a zero-norm vector
    # would raise DIVIDE_BY_ZERO and kill the query; null is the right
    # "undefined similarity" answer.
    return dot / F.nullif(na * nb, F.lit(0.0))


# DoubleType() (not the DDL string "double"): the string form parses the
# DDL through the active session at import time — importable only with a
# running SparkContext.
@pandas_udf(DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine: each batch becomes two (n, d) numpy
    matrices; one fused BLAS pass per batch."""
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)
