from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.oracle import assert_matches_oracle

QUERY_NAMES = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


# Entries allowed to return 0 rows at SF_SMOKE.  Everything else must be
# non-empty: a 0=0 oracle comparison is vacuous — it greens a broken
# implementation (VERDICT r6 found ann_range_search passing that way).
#: entries allowed to be empty at sf0.001 (oracle match still runs;
#: nonvacuity is proven elsewhere): stream_crawl_to_shards' arrival-
#: order head keeps only low-doc_id pages at this SF and the NB gate
#:  happens to admit none of them (16 rows at sf0.01, exact at 3 SFs);
#: the hand-built nonzero chain lives in tests/test_stream_crawl.py::
#: test_composed_chain_nonzero_with_kill_restart.
EMPTY_OK: frozenset = frozenset({"stream_crawl_to_shards"})


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, SF_SMOKE)
    if name in oracles:
        assert_matches_oracle(df, oracles[name], SF_SMOKE)
        if name not in EMPTY_OK:
            assert df.count() > 0, (
                f"entry '{name}' is empty at {SF_SMOKE} — the oracle match "
                f"is vacuous; re-calibrate the fixture or add to EMPTY_OK")
    else:
        assert df.count() >= 0
