"""SQL front-end for the DSL: register any StreamProcessor term as a
table-valued function, callable from plain ``spark.sql``:

    register_stream_processor(spark, "rspl_swap", swap_forever, "bigint")
    spark.sql('''
        SELECT * FROM rspl_swap(TABLE(events)
                                PARTITION BY key ORDER BY seq)
    ''')

Semantics match the keyed interpreter exactly: one fresh term instance
per partition (Spark instantiates the UDTF per partition — with
PARTITION BY that is one per key group), rows arrive in ORDER BY order,
``terminate`` flushes nothing (a Get on exhausted input just stops, the
reference's prefix semantics). This is the "UML-like language compiled
to rspl" future-work item of the reference's closing remarks
(examples/pelican.rs:373-376) realized as SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from rspl_spark.dsl.core import StreamProcessor, run_prefix


def register_stream_processor(
    spark: SparkSession,
    name: str,
    sp_factory: Callable[[], StreamProcessor],
    out_type: str,
    key_col: str = "key",
    value_col: str = "value",
) -> None:
    """Register ``sp_factory`` as TVF ``name``.

    Output rows: (key, seq, value) with seq = per-partition output
    ordinal. The input table must expose ``key_col`` and ``value_col``;
    call with ``PARTITION BY <key> ORDER BY <seq>`` for keyed streams or
    ``WITH SINGLE PARTITION ORDER BY <seq>`` for one global stream.
    """

    @udtf(returnType=f"`{key_col}` string, seq bigint, `{value_col}` {out_type}")
    class Runner:
        def __init__(self):
            self._sp = sp_factory()
            self._n = 0

        def eval(self, row):
            outs, self._sp = run_prefix(self._sp, [row[value_col]])
            key = str(row[key_col])
            for v in outs:
                yield key, self._n, v
                self._n += 1

    spark.udtf.register(name, Runner)
