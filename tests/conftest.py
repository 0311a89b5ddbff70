from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from bdqc_spark.session import build_session

    s = build_session(app_name="bdqc-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
