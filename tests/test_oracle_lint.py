"""Static lint over every registered oracle SQL.

Three rounds in a row an uncast integer ``sum()`` cost a driver row: DuckDB
promotes integer SUM to HUGEINT, the driver's value hash is type-sensitive,
and Spark has no 128-bit integer — so the hashes diverge even when every
value is string-identical.  This test runs ``DESCRIBE <oracle>`` in DuckDB
for all ~90 registered oracles and fails on any HUGEINT/UHUGEINT output
column, killing the bug class at commit time instead of at the next
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import os

import pytest

from radmapper_spark.entrypoints import ENTRIES

from tests.oracle import duck_conn

SF_DIR = os.environ.get("RM_TEST_SF_DIR", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "UHUGEINT")


def _oracles():
    return [(name, sql()) for name, (_fn, sql) in ENTRIES.items()
            if sql is not None]


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_has_no_hugeint_columns(name, sql):
    con = duck_conn(SF_DIR)
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc
           if any(b in typ.upper() for b in BANNED)]
    assert not bad, (
        f"oracle '{name}' produces 128-bit integer columns {bad}; "
        f"cast with ::BIGINT — the driver hash is type-sensitive and Spark "
        f"has no HUGEINT, so this WILL fail the correctness gate")
