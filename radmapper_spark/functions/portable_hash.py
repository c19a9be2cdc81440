"""Engine-portable hashing for oracle-checkable operators.

The dedup/fingerprint operators default to Spark's ``xxhash64`` — the fast
production path — but xxhash64 (with Spark's seed wiring) is not available
in DuckDB SQL, so entries built on it can only get a rows-only correctness
check. This module defines a second hash family that BOTH engines compute
bit-identically from SQL built-ins, so the driver's DuckDB oracle can
reproduce minhash / simhash / fingerprint values exactly:

- ``ph60(s)  = int(md5(s)[:15], 16)``  — 60-bit string hash.
  Spark:  ``conv(substr(md5(s), 1, 15), 16, 10)::long``
  DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``
- ``ph28(s)  = int(md5(s)[:7], 16)``   — 28-bit string hash, small enough
  that an affine rehash ``(a*h + b) % P31`` (a, b < P31 = 2^31-1) stays
  under 2^59 — no BIGINT overflow under Spark ANSI mode, identical
  wrap-free arithmetic in DuckDB.
- ``affine_coeffs(n)`` — n deterministic (a, b) pairs for the universal
  family h_i(x) = (a_i*x + b_i) mod P31 (Carter-Wegman); both the Spark
  plan and the generated oracle SQL read the SAME Python list, so parity
  is by construction.
- polynomial combine (base ``POLY_B`` mod P31) for order-sensitive window
  and band hashes: acc = (acc * B + x) % P31 keeps acc < 2^31 so
  acc*B + x < 2^52 — overflow-free in both engines.

Hash-quality note: 28/60-bit md5 prefixes are uniform (md5's avalanche is
fine for non-adversarial fingerprinting); collisions only degrade sketch
quality marginally and NEVER cause engine disagreement, because both
engines compute the same function. Production default stays xxhash64.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

P31 = (1 << 31) - 1          # Mersenne prime 2^31 - 1
POLY_B = 1_000_003           # polynomial-combine base
_COEFF_SEED = 20260813


def ph60(col):
    """Spark Column: 60-bit md5-prefix hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ph28(col):
    """Spark Column: 28-bit md5-prefix hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def duck_ph60(expr: str) -> str:
    """DuckDB SQL text computing the same 60-bit hash of `expr`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def duck_ph28(expr: str) -> str:
    """DuckDB SQL text computing the same 28-bit hash of `expr`."""
    return f"('0x' || substr(md5({expr}), 1, 7))::BIGINT"


def affine_coeffs(n: int) -> list:
    """n deterministic (a, b) pairs, a in [1, P31), b in [0, P31)."""
    rng = random.Random(_COEFF_SEED)
    return [(rng.randrange(1, P31), rng.randrange(0, P31)) for _ in range(n)]


def affine_col(h, a: int, b: int):
    """Spark Column: (a*h + b) % P31 on a <=28-bit hash column."""
    return (F.lit(a).cast("long") * h + F.lit(b).cast("long")) % F.lit(P31).cast("long")


def duck_affine(expr: str, a: int, b: int) -> str:
    # constants cast to BIGINT explicitly: DuckDB keeps INT32 for small
    # literals and range-checks INT32 arithmetic instead of promoting
    return f"(({a}::BIGINT * ({expr}) + {b}::BIGINT) % {P31})"


def poly_col(parts):
    """Spark Column: order-sensitive polynomial combine of hash Columns
    (each < P31): fold acc = (acc*B + x) % P31."""
    acc = parts[0] % F.lit(P31).cast("long")
    for x in parts[1:]:
        acc = (acc * F.lit(POLY_B).cast("long") + x) % F.lit(P31).cast("long")
    return acc


def duck_poly(exprs: list) -> str:
    acc = f"(({exprs[0]})::BIGINT % {P31})"
    for x in exprs[1:]:
        acc = f"(({acc} * {POLY_B}::BIGINT + ({x})) % {P31})"
    return acc
