"""Bloom-filter properties (SURVEY §5.4): no false negatives, and
probe-then-verify dedup ≡ exact anti-join (the reference's
set.difference semantics, seek_crawler.py:196)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.bloom import bloom_probe, build_bloom, dedup_against_seen

N_SEEN = 2_000
N_NEW = 1_000
N_SHARDS = 8


def _seen_df(spark):
    return spark.range(N_SEEN).select(
        F.concat(F.lit("https://h.example/doc/"), F.col("id")).alias("url_canon")
    )


def _cand_df(spark):
    # half overlap with seen, half brand new
    return spark.range(N_SEEN - N_NEW, N_SEEN + N_NEW).select(
        F.concat(F.lit("https://h.example/doc/"), F.col("id")).alias("url_canon"),
        (F.col("id") % 7).alias("payload"),
    )


def test_no_false_negatives(spark):
    seen = _seen_df(spark)
    bloom = build_bloom(seen, n_shards=N_SHARDS).cache()
    assert bloom.count() == N_SHARDS
    probed = bloom_probe(_cand_df(spark), bloom, N_SHARDS)
    misses = probed.filter(
        ~F.col("maybe_seen")
        & (F.regexp_extract("url_canon", r"(\d+)$", 1).cast("long") < N_SEEN)
    ).count()
    assert misses == 0  # a seen URL may never probe negative


def test_false_positive_rate_sane(spark):
    bloom = build_bloom(_seen_df(spark), n_shards=N_SHARDS)
    probed = bloom_probe(_cand_df(spark), bloom, N_SHARDS)
    fp = probed.filter(
        F.col("maybe_seen")
        & (F.regexp_extract("url_canon", r"(\d+)$", 1).cast("long") >= N_SEEN)
    ).count()
    # 12 bits/key, 6 hashes → theoretical fp ≈ 0.3%; allow 5% slack
    assert fp / N_NEW < 0.05


def test_dedup_equals_exact_anti_join(spark):
    seen = _seen_df(spark)
    cand = _cand_df(spark)
    bloom = build_bloom(seen, n_shards=N_SHARDS)
    with_bloom = dedup_against_seen(cand, seen, bloom, N_SHARDS)
    exact = dedup_against_seen(cand, seen, None)
    got = {(r["url_canon"], r["payload"]) for r in with_bloom.collect()}
    want = {(r["url_canon"], r["payload"]) for r in exact.collect()}
    assert got == want
    assert len(want) == N_NEW


def test_empty_seen(spark):
    cand = _cand_df(spark)
    bloom = build_bloom(_seen_df(spark).limit(0), n_shards=N_SHARDS)
    out = dedup_against_seen(cand, _seen_df(spark).limit(0), bloom, N_SHARDS)
    assert out.count() == cand.count()
