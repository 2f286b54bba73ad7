"""Cuckoo-filtered engine parity + the seen-expiry recrawl policy."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from crawlspark.fixtures import gen_seeds, politeness_rows, robots_rows
from crawlspark.scheduler import CrawlEngine
from crawlspark.tableio import SnapshotCatalog


def _engine(spark, pages, **kw):
    cat = SnapshotCatalog(tempfile.mkdtemp(), spark)
    eng = CrawlEngine(
        spark, cat, pages, gen_seeds("tiny"), politeness_rows(),
        robots_rows(42, "tiny"), round_seconds=600.0, **kw,
    )
    return cat, eng


def test_cuckoo_filter_observationally_identical(spark, tiny_pages, cat4):
    """seen_filter='cuckoo' must reproduce the bloom baseline exactly —
    the filter is a pure physical layer."""
    cat, eng = _engine(spark, tiny_pages, seen_filter="cuckoo")
    eng.run(3, resume=False)
    seen_a = sorted(r["url_canon"] for r in cat.read("seen").collect())
    seen_b = sorted(
        r["url_canon"] for r in cat4.read_as_of_round("seen", 2).collect()
    )
    assert seen_a == seen_b
    log_a = sorted(
        (r["round"], r["phase"], r["url"], r["ok"])
        for r in cat.read("crawl_log").collect()
    )
    log_b = sorted(
        (r["round"], r["phase"], r["url"], r["ok"])
        for r in cat4.read_as_of_round("crawl_log", 2).collect()
    )
    assert log_a == log_b
    assert cat.exists("seen_cuckoo") and not cat.exists("seen_bloom")


def test_expire_seen_triggers_recrawl(spark, tiny_pages):
    """After expiring everything, the next rotation pass refetches the
    same detail URLs. One seed per site (rotation period 1) so the
    recrawl happens on the very next round."""
    import tempfile

    seeds = [
        next(s for s in gen_seeds("tiny") if s["site"] == site)
        for site in ("seek", "jora", "careerone")
    ]
    cat = SnapshotCatalog(tempfile.mkdtemp(), spark)
    eng = CrawlEngine(
        spark, cat, tiny_pages, seeds, politeness_rows(),
        robots_rows(42, "tiny"), round_seconds=600.0, seen_filter="cuckoo",
    )
    eng.run(1, resume=False)
    first_cycle = {
        r["url"]
        for r in cat.read("crawl_log")
        .filter((F.col("phase") == "detail") & F.col("ok"))
        .collect()
    }
    seen_before = cat.read("seen").count()
    assert seen_before > 0

    n_expired = eng.expire_seen(before_round=1)  # expire everything
    assert n_expired == seen_before
    assert cat.read("seen").count() == 0

    eng.run(2, resume=True)  # round 1 — same seed as round 0
    second_cycle = {
        r["url"]
        for r in cat.read("crawl_log")
        .filter(
            (F.col("phase") == "detail") & F.col("ok") & (F.col("round") == 1)
        )
        .collect()
    }
    # every successfully fetched URL from round 0 is refetched
    assert first_cycle <= second_cycle


def test_partial_expiry_keeps_recent(spark, tiny_pages):
    cat, eng = _engine(spark, tiny_pages, seen_filter="bloom")
    eng.run(2, resume=False)
    total = cat.read("seen").count()
    old = cat.read("seen").filter(F.col("first_round") < 2).count()
    n = eng.expire_seen(before_round=2)
    assert n == old
    assert cat.read("seen").count() == total - old
    # bloom was rebuilt from the kept set: no false negatives on it
    from crawlspark.bloom import bloom_probe

    kept = cat.read("seen")
    bloom = cat.read("seen_bloom")
    probed = bloom_probe(kept.select("url_canon"), bloom, eng.bloom_shards)
    assert probed.filter(~F.col("maybe_seen")).count() == 0