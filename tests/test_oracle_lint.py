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

# DuckDB output types with a PROVEN green driver row (surveyed across all
# 90 entries, rounds 1-7): these fetch into the same Python/Arrow value
# domain as their Spark counterparts.  Everything else fails the lint:
# HUGEINT/UHUGEINT exports as decimal128 (the thrice-observed hash
# poison); DECIMAL outputs diverge on engine scale/rounding rules (every
# exact-decimal entry casts to DOUBLE at the boundary for this reason);
# FLOAT would compare 32-bit against Spark doubles.
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
           "DOUBLE", "VARCHAR", "BOOLEAN", "TIMESTAMP", "DATE"}


def _oracles():
    return [(name, sql()) for name, (_fn, sql) in ENTRIES.items()
            if sql is not None]


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_output_types_in_green_repertoire(name, sql):
    con = duck_conn(SF_DIR)
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc
           if typ.upper().split("(")[0] not in ALLOWED]
    assert not bad, (
        f"oracle '{name}' produces columns outside the driver-green type "
        f"repertoire: {bad}. Cast integer sums ::BIGINT and decimals/"
        f"floats ::DOUBLE — the driver hash is type-sensitive (HUGEINT "
        f"cost a driver row in rounds 5, 6 AND 7's backlog)")
