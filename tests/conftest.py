from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from etl_pipeline_excel_sql__spark.session import get_session

    s = get_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    if not Path(SF_SMOKE).is_dir():
        pytest.skip(f"generated test corpus missing: {SF_SMOKE}")
    return SF_SMOKE
