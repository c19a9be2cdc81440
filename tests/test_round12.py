"""Round-12 regression tests: the r11-advice fixes.

1 (medium): load_tables revalidates its memo's sf_dir fingerprint on
   EVERY hit, so a derived-frame cache's FIRST build (cache miss) after
   an external rewrite can no longer read through a pinned file listing
   and stamp a fresh fingerprint onto frames built from stale scans.
2 (low): _check_base_params structurally probes packed-hash bases —
   an attr-less base holding values outside the consumer's bit range
   fails loudly instead of silently collapsing high bands.
3 (low): sf_fingerprint stats each file once (atomic per-file witness).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _rewrite_documents(sfd, n_rows=100):
    """Rewrite documents.parquet in place with different content+size."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM "
                f"'{sfd}/documents.parquet' LIMIT {n_rows}")
    con.execute(f"COPY t TO '{sfd}/documents.parquet' (FORMAT PARQUET)")
    con.close()


def test_load_tables_revalidates_on_every_hit(spark, tmp_path):
    """A memoized load followed by an external rewrite returns FRESH
    data on the next load_tables call — no caller-side invalidate."""
    from radmapper_spark.session import load_tables

    sfd = tmp_path / "sf"
    shutil.copytree(SF_SMOKE, sfd)
    n0 = load_tables(spark, str(sfd))["documents"].count()
    assert n0 != 100
    _rewrite_documents(sfd)
    n1 = load_tables(spark, str(sfd))["documents"].count()
    assert n1 == 100  # stale memo detected and rebuilt


def test_first_derived_build_after_rewrite_sees_fresh_data(spark, tmp_path):
    """The r11-advice MEDIUM gap: table memo exists, external rewrite,
    then a derived cache's FIRST-EVER build (cache-miss path — no
    stale-hit invalidate runs). The build must see the rewritten data,
    and the fingerprint it stamps must validate as fresh afterwards."""
    from radmapper_spark import entrypoints as E

    sfd = tmp_path / "sf"
    shutil.copytree(SF_SMOKE, sfd)
    # create the table memo BEFORE the rewrite (the pinned listing)
    n0 = E.load_tables(spark, str(sfd))["documents"].count()
    _rewrite_documents(sfd)

    calls = []

    def build(tables):
        calls.append(1)
        return {"docs": tables["documents"].select("doc_id").persist()}

    cache: dict = {}
    a = E._cached_frames(cache, spark, str(sfd), build)["docs"]
    assert len(calls) == 1
    assert a.count() == 100 and n0 != 100  # built from FRESH scans
    # and the stamped fingerprint is genuinely fresh: a second call hits
    b = E._cached_frames(cache, spark, str(sfd), build)["docs"]
    assert len(calls) == 1 and b is a
    cache.pop((E.session_key(spark), str(sfd)))["docs"].unpersist()


def test_bpe_merges_first_build_after_rewrite(spark, tmp_path):
    """Same first-build gap for the BPE merge memo (hit is None path):
    training after an external rewrite must read the rewritten corpus."""
    from radmapper_spark import entrypoints as E

    sfd = tmp_path / "sf"
    shutil.copytree(SF_SMOKE, sfd)
    E.load_tables(spark, str(sfd))  # pin the table memo pre-rewrite
    _rewrite_documents(sfd, n_rows=50)
    merges = E._bpe_merges(spark, str(sfd))
    # independent check: retrain on a FRESH read of the rewritten corpus
    from radmapper_spark.operators import tokenizer
    fresh = spark.read.parquet(f"{sfd}/documents.parquet")
    expect = tokenizer.bpe_train(fresh, n_merges=E._BPE_MERGES,
                                 top_words=E._BPE_TOPW)
    assert merges == expect
    E._BPE_CACHE.clear()


def test_sf_fingerprint_single_stat_and_shape(tmp_path):
    """One os.stat per file; (name, mtime_ns, size) triples, sorted."""
    import os
    from unittest.mock import patch

    from radmapper_spark.session import sf_fingerprint

    d = tmp_path / "sf"
    d.mkdir()
    (d / "b.parquet").write_bytes(b"22")
    (d / "a.parquet").write_bytes(b"1")
    (d / "ignore.txt").write_bytes(b"x")
    real_stat = os.stat
    calls = []

    def counting_stat(p, *a, **k):
        calls.append(p)
        return real_stat(p, *a, **k)

    with patch("radmapper_spark.session.os.stat", counting_stat):
        fp = sf_fingerprint(str(d))
    assert len(calls) == 2  # one stat per parquet file, none doubled
    assert [t[0] for t in fp] == ["a.parquet", "b.parquet"]
    assert [t[2] for t in fp] == [1, 2]
    assert sf_fingerprint(str(d / "missing")) is None


# ------------------------------------- packed-hash base structural probe

def _fake_media_base(spark, hashes):
    df = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)],
        "media_id: long, phash: long")
    return df


def test_packed_hash_probe_rejects_wider_base(spark):
    """An attr-less base holding a 64-bit value fed to a 60-bit band
    consumer fails loudly (r11 advice: high bands would otherwise
    collapse to one hot bucket and the recall guarantee silently dies)."""
    from radmapper_spark.operators import multimodal

    media = spark.createDataFrame([(1, b"x")], "media_id: long, payload: binary")
    wide = _fake_media_base(spark, [1 << 62, 5])
    with pytest.raises(ValueError, match="outside the 60-bit range"):
        multimodal.phash_neardup_pairs(media, base=wide, bits=60)
    # negative values (sign bit in play) are also out of range
    neg = _fake_media_base(spark, [-1, 5])
    with pytest.raises(ValueError, match="outside the 60-bit range"):
        multimodal.phash_neardup_pairs(media, base=neg, bits=60)


def test_packed_hash_probe_accepts_compliant_base_and_memoizes(spark):
    """In-range attr-less base passes; the probed range is memoized on a
    separate attr (a second check runs no job) and rm_base_params stays
    unset (the range does NOT pin the build params)."""
    from radmapper_spark.operators import dedup

    base = _fake_media_base(spark, [0, (1 << 60) - 1])
    dedup._check_base_params(base, "phash_neardup_pairs", bits=60)
    assert base._rm_probed_hash_range == (0, (1 << 60) - 1)
    assert getattr(base, "rm_base_params", None) is None
    # memoized: poison agg to prove no second job runs
    base.agg = None
    dedup._check_base_params(base, "phash_neardup_pairs", bits=60)
    # but a tighter consumer still rejects via the memoized range
    with pytest.raises(ValueError, match="outside the 48-bit range"):
        dedup._check_base_params(base, "x", bits=48)


def test_packed_hash_probe_vacuous_at_64_bits(spark):
    """nbits=64 leaves the full signed range in play — nothing checkable,
    no probe job (the simhash default path stays job-free)."""
    from radmapper_spark.operators import dedup

    base = _fake_media_base(spark, [-5]).withColumnRenamed("phash", "simhash")
    base.agg = None  # would raise if the probe ran a job
    dedup._check_base_params(base, "simhash_pairs", nbits=64)


def test_stamped_attr_still_authoritative(spark):
    """A stamped base mismatched in bits raises from the attr compare
    (primary path), not the probe."""
    from radmapper_spark.operators import dedup

    base = _fake_media_base(spark, [5])
    base.rm_base_params = {"bits": 64}
    with pytest.raises(ValueError, match="mismatched"):
        dedup._check_base_params(base, "phash_neardup_pairs", bits=60)
