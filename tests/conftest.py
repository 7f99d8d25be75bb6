import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyra_spark.fixtures import materialize
from lyra_spark.session import get_spark

FIXTURE_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="lyra_spark_tests")
    yield s


@pytest.fixture(scope="session")
def fixtures_sf0001() -> str:
    """Deterministic sf0.001 transcript fixtures, cached across test runs."""
    return materialize("0.001", os.path.join(FIXTURE_CACHE, "sf0.001"))


def normalize_violations(df: pd.DataFrame) -> list[tuple]:
    """Canonical tuple form for engine-vs-oracle comparison."""
    out = []
    for r in df.itertuples(index=False):
        obs = None if r.observed_value is None or (isinstance(r.observed_value, float)) else str(r.observed_value)
        # NULL keys survive as violations of the required rules — keep them sortable
        turn = -1 if pd.isna(r.turn_idx) else int(r.turn_idx)
        out.append((str(r.conv_id), turn, str(r.rule_id), obs))
    return sorted(out, key=lambda t: (t[0], t[1], t[2], t[3] or ""))
