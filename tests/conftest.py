from __future__ import annotations

import pytest

# Must run BEFORE the SparkSession exists: executor Python workers
# inherit PYTHONPATH from the JVM's environment at launch, and the
# vendored protobuf (transformWithStateInPandas state-server protocol)
# rides on it. No-op when protobuf is natively importable.
from rspl_spark.streaming.tws_runtime import enable_tws_runtime

TWS_AVAILABLE = enable_tws_runtime()

from rspl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rspl-tests", cpus=8)
    yield s
