"""Cuckoo seen-filter: no false negatives, probe-then-verify ≡ exact
anti-join, deletion semantics (the bloom-impossible path), and the
two-bucket involution invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.cuckoo import (
    build_cuckoo,
    cuckoo_probe,
    dedup_against_seen_cuckoo,
    delete_from_cuckoo,
)

N_SHARDS = 8


def _urls(spark, lo, hi, payload=False):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("https://h.example/doc/"), F.col("id")).alias("url_canon")
    )
    if payload:
        df = df.withColumn("payload", (F.col("url_canon").substr(-1, 1)))
    return df


def test_no_false_negatives(spark):
    seen = _urls(spark, 0, 3000)
    ck = build_cuckoo(seen, n_shards=N_SHARDS).cache()
    assert ck.count() == N_SHARDS
    probed = cuckoo_probe(_urls(spark, 0, 3000), ck, N_SHARDS)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate(spark):
    ck = build_cuckoo(_urls(spark, 0, 3000), n_shards=N_SHARDS)
    probed = cuckoo_probe(_urls(spark, 3000, 5000), ck, N_SHARDS)
    fp = probed.filter(F.col("maybe_seen")).count()
    # 16-bit fingerprints, 8 slots checked → fp ≈ 8/2^16 ≈ 0.012%
    assert fp / 2000 < 0.01


def test_dedup_equals_exact(spark):
    seen = _urls(spark, 0, 2000)
    cand = _urls(spark, 1000, 3000, payload=True)
    ck = build_cuckoo(seen, n_shards=N_SHARDS)
    got = {
        tuple(r)
        for r in dedup_against_seen_cuckoo(cand, seen, ck, N_SHARDS).collect()
    }
    want = {
        tuple(r) for r in dedup_against_seen_cuckoo(cand, seen, None).collect()
    }
    assert got == want
    assert len(want) == 1000


def test_delete_reopens_urls(spark):
    """Seen-expiry: deleted keys probe negative again (so the frontier
    can re-schedule them); undeleted keys keep probing positive."""
    seen = _urls(spark, 0, 2000)
    expired = _urls(spark, 0, 500)
    ck = build_cuckoo(seen, n_shards=N_SHARDS)
    ck2 = delete_from_cuckoo(ck, expired, N_SHARDS).cache()
    probed = cuckoo_probe(
        _urls(spark, 0, 2000).withColumn(
            "idx", F.regexp_extract("url_canon", r"(\d+)$", 1).cast("long")
        ),
        ck2,
        N_SHARDS,
    )
    # all expired keys must be re-crawlable (no stuck positives beyond
    # fingerprint-collision survivors, which are positives not negatives)
    still_pos = probed.filter((F.col("idx") < 500) & F.col("maybe_seen")).count()
    assert still_pos / 500 < 0.01  # only fp-collisions with live keys
    # live keys: deletion may create the documented rare false negative
    # (shared bucket+fingerprint) — bound it, and note it only costs a
    # refetch, never wrong output
    false_neg = probed.filter((F.col("idx") >= 500) & ~F.col("maybe_seen")).count()
    assert false_neg / 1500 < 0.01
    # n_keys accounting went down
    n = ck2.agg(F.sum("n_keys")).collect()[0][0]
    assert n == 1500


def test_involution_property():
    """alt(alt(b)) == b for every fingerprint — the invariant that
    makes eviction placement findable by the probe."""
    import numpy as np
    import pandas as pd

    from crawlspark.cuckoo import _alt_bucket, _fp_and_buckets

    n_buckets = 1 << 12
    vals = pd.Series([f"https://x.example/{i}" for i in range(2000)])
    fp, b1, b2 = _fp_and_buckets(vals, n_buckets)
    for i in range(0, 2000, 37):
        assert _alt_bucket(int(fp[i]), int(b1[i]), n_buckets) == int(b2[i])
        assert _alt_bucket(int(fp[i]), int(b2[i]), n_buckets) == int(b1[i])
    assert (fp >= 1).all() and (b1 < n_buckets).all() and (b2 < n_buckets).all()
