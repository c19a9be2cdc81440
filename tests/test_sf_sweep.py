"""Three-SF oracle sweep: every oracle-gated entry checked at sf0.001,
sf0.01 AND sf0.1. The sf0.1 pass caught two SF-dependent bugs in round 5
(sign-LSH recall margin, PQ rerank margin), so it stays in CI shape —
but it is minutes of CPU, so it is gated like the scale stress tests.

Run on demand:

    RM_SF_SWEEP=1 python -m pytest tests/test_sf_sweep.py -q

(The default suite still oracle-checks everything once at sf0.001 via
tests/test_headline.py.)
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches_oracle

pytestmark = pytest.mark.skipif(
    os.environ.get("RM_SF_SWEEP") != "1",
    reason="set RM_SF_SWEEP=1 to run the multi-minute three-SF oracle sweep")

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle_at_sf(spark, name, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, sf_dir)
    if name in oracles:
        assert_matches_oracle(df, oracles[name], sf_dir)
    else:
        assert df.count() >= 0
