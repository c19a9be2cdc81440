"""Differential tests of the portable hash family: the SAME values must
come out of (a) the Spark Column expressions, (b) the generated DuckDB
SQL, and (c) plain Python — this three-way agreement is the entire
contract that makes the minhash/simhash/fingerprint oracles exact."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from radmapper_spark.functions import portable_hash as PH

# printable-ish strings plus unicode, whitespace runs, and empties —
# the shapes the shingle/token pipelines actually feed through
CASES = ["", " ", "a", "hello world", "café ☕ ünïcode", "a  b\t c",
         "the quick brown fox", "x" * 500, "0", "-1", "' OR 1=1 --",
         'quote " backslash \\ mix', "\n", "tab\ttab"]


def _py60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py28(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:7], 16)


def test_three_way_hash_agreement(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = {r["s"]: (r["h60"], r["h28"]) for r in df.select(
        "s", PH.ph60(F.col("s")).alias("h60"),
        PH.ph28(F.col("s")).alias("h28")).collect()}
    con = duckdb.connect()
    for s in CASES:
        d60, d28 = con.execute(
            f"SELECT {PH.duck_ph60('?')}, {PH.duck_ph28('?')}",
            [s, s]).fetchone()
        assert got[s] == (_py60(s), _py28(s)), f"spark vs python on {s!r}"
        assert (d60, d28) == (_py60(s), _py28(s)), f"duckdb vs python on {s!r}"


def test_affine_and_poly_agreement(spark):
    """Affine rehash and polynomial combine: Spark vs DuckDB vs Python on
    the full 28-bit input range boundary values."""
    hs = [0, 1, (1 << 28) - 1, 123456789, 2**27 + 17]
    coeffs = PH.affine_coeffs(8)
    con = duckdb.connect()
    df = spark.createDataFrame([(h,) for h in hs], "h long")
    for a, b in coeffs:
        want = [(a * h + b) % PH.P31 for h in hs]
        got = [r[0] for r in df.select(
            PH.affine_col(F.col("h"), a, b)).collect()]
        duck = [con.execute(
            f"SELECT {PH.duck_affine(str(h), a, b)}").fetchone()[0]
            for h in hs]
        assert got == want and duck == want
    # polynomial combine over a window of boundary values
    win = [(1 << 28) - 1, 0, 2**27, 99, 1, (1 << 28) - 2, 7, 13]
    acc = win[0] % PH.P31
    for x in win[1:]:
        acc = (acc * PH.POLY_B + x) % PH.P31
    got = spark.range(1).select(
        PH.poly_col([F.lit(x).cast("long") for x in win])).collect()[0][0]
    duck = con.execute(
        f"SELECT {PH.duck_poly([str(x) for x in win])}").fetchone()[0]
    assert got == acc == duck


def test_affine_coeffs_deterministic_and_in_range():
    c1, c2 = PH.affine_coeffs(32), PH.affine_coeffs(32)
    assert c1 == c2  # same list every call — parity by construction
    assert len({tuple(x) for x in c1}) == 32
    for a, b in c1:
        assert 1 <= a < PH.P31 and 0 <= b < PH.P31


def test_no_overflow_at_input_extremes(spark):
    """(a*h + b) with a,b < 2^31 and h < 2^28 stays < 2^59 — prove the
    ANSI-mode plan doesn't raise at the extreme corner."""
    a = b = PH.P31 - 1
    h = (1 << 28) - 1
    out = spark.range(1).select(
        PH.affine_col(F.lit(h).cast("long"), a, b)).collect()[0][0]
    assert out == (a * h + b) % PH.P31
