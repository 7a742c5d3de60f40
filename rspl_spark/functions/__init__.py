"""Scalar/expression function library — the engine's `F`-style namespace.

Everything here is a Column-in/Column-out expression (JVM-side,
codegen'd) usable in any DataFrame program — with ONE exception:
``cosine_pandas`` is the Arrow-vectorized pandas-UDF sibling of
``cosine`` (Python workers, batch BLAS; pick it for wide vectors where
the expression form's per-element lambda loses to numpy):

    from rspl_spark import functions as RF
    df.select(RF.cosine(df.a, df.b), RF.portable_hash(df.text))
"""

from rspl_spark.operators.dedup import (  # noqa: F401
    minhash_sig,
    portable_hash,
    shingle_combine,
    string_shingles,
)
from rspl_spark.operators.similarity import (  # noqa: F401
    cosine_expr as cosine,
    cosine_pandas,
)
