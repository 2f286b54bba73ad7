"""Incremental bloom maintenance (SURVEY §7.5): O(delta) updates must
preserve the no-false-negative property and leave dedup results
identical to a full rebuild; the scheduler's load-factor rebuild
policy must keep rounds deterministic (bloom is a pure perf layer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.bloom import (
    bloom_probe,
    build_bloom,
    dedup_against_seen,
    update_bloom,
)

N_SHARDS = 8


def _urls(spark, lo, hi, payload=False):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("https://h.example/doc/"), F.col("id")).alias("url_canon")
    )
    if payload:
        df = df.withColumn("payload", F.crc32("url_canon") % 7)
    return df


def test_incremental_no_false_negatives(spark):
    base = _urls(spark, 0, 1500)
    delta1 = _urls(spark, 1500, 2200)
    delta2 = _urls(spark, 2200, 2600)
    bloom = build_bloom(base, n_shards=N_SHARDS)
    bloom = update_bloom(bloom, delta1, N_SHARDS)
    bloom = update_bloom(bloom, delta2, N_SHARDS).cache()
    assert bloom.count() == N_SHARDS
    # every inserted key must probe positive
    probed = bloom_probe(_urls(spark, 0, 2600), bloom, N_SHARDS)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # n_keys accounting
    total = bloom.agg(F.sum("n_keys")).collect()[0][0]
    assert total == 2600


def test_incremental_dedup_equals_full_rebuild(spark):
    seen = _urls(spark, 0, 2000)
    cand = _urls(spark, 1000, 3000, payload=True)
    incr = update_bloom(
        build_bloom(_urls(spark, 0, 1200), n_shards=N_SHARDS),
        _urls(spark, 1200, 2000),
        N_SHARDS,
    )
    full = build_bloom(seen, n_shards=N_SHARDS)
    out_incr = {
        tuple(r) for r in dedup_against_seen(cand, seen, incr, N_SHARDS).collect()
    }
    out_full = {
        tuple(r) for r in dedup_against_seen(cand, seen, full, N_SHARDS).collect()
    }
    out_exact = {
        tuple(r) for r in dedup_against_seen(cand, seen, None).collect()
    }
    assert out_incr == out_full == out_exact


def test_update_into_empty_shard(spark):
    # keys concentrated so some shards start absent
    bloom = build_bloom(_urls(spark, 0, 1).limit(0), n_shards=N_SHARDS)
    bloom = update_bloom(bloom, _urls(spark, 0, 500), N_SHARDS)
    probed = bloom_probe(_urls(spark, 0, 500), bloom, N_SHARDS)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_scheduler_uses_incremental_and_stays_deterministic(spark, tiny_pages, cat4):
    """Rounds with incremental bloom must reproduce the cat4 baseline
    (which may itself have used any mix of rebuild/update — bloom is
    observationally transparent), and snapshots must carry n_keys."""
    import tempfile

    from crawlspark.fixtures import gen_seeds, politeness_rows, robots_rows
    from crawlspark.scheduler import CrawlEngine
    from crawlspark.tableio import SnapshotCatalog

    cat = SnapshotCatalog(tempfile.mkdtemp(), spark)
    CrawlEngine(
        spark, cat, tiny_pages, gen_seeds("tiny"), politeness_rows(),
        robots_rows(42, "tiny"), round_seconds=600.0,
    ).run(3, resume=False)
    seen_a = sorted(r["url_canon"] for r in cat.read("seen").collect())
    seen_b = sorted(
        r["url_canon"]
        for r in cat4.read_as_of_round("seen", 2).collect()
    )
    assert seen_a == seen_b
    bloom = cat.read("seen_bloom")
    assert "n_keys" in bloom.columns
    assert bloom.agg(F.sum("n_keys")).collect()[0][0] >= len(seen_a)
