from __future__ import annotations

import pytest

from rspl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rspl-tests", cpus=8)
    yield s
