from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from cog3pio_spark.session import get_spark

    sp = get_spark("tests", master="local[4]", shuffle_partitions=8)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp


@pytest.fixture(scope="session")
def fixture_rows():
    from cog3pio_spark.fixtures.cogs import ensure_fixtures

    return ensure_fixtures()


@pytest.fixture(scope="session")
def fixture_refs(fixture_rows):
    return [r["media_ref"] for r in fixture_rows if r["valid"]]
