"""Checkpoint/resume tests (SURVEY §5.5, M5): kill-and-resume must
reproduce the uninterrupted run byte-for-byte, and a round that crashed
mid-commit must be replayed idempotently (crawl_log commits last = the
round's commit marker). The uninterrupted baseline is the shared
``cat4`` fixture, read as-of round k via snapshot time travel."""

from __future__ import annotations

import tempfile

import pytest

from crawlspark.fixtures import gen_seeds, politeness_rows, robots_rows
from crawlspark.scheduler import CrawlEngine
from crawlspark.tableio import SnapshotCatalog


def _new_engine(spark, cat, pages):
    return CrawlEngine(
        spark, cat, pages, gen_seeds("tiny"), politeness_rows(),
        robots_rows(42, "tiny"), round_seconds=600.0,
    )


def _state(cat, as_of: int | None = None):
    read = (
        cat.read if as_of is None else (lambda t: cat.read_as_of_round(t, as_of))
    )
    seen = sorted(r["url_canon"] for r in read("seen").collect())
    log = sorted(
        (r["round"], r["phase"], r["url"], r["ok"])
        for r in read("crawl_log").collect()
    )
    meta = sorted(
        tuple(r) for r in read("job_metadata").drop("crawled_date").collect()
    )
    return seen, log, meta


def test_stop_and_resume_equals_uninterrupted(spark, tiny_pages, cat4):
    cat_b = SnapshotCatalog(tempfile.mkdtemp(), spark)
    _new_engine(spark, cat_b, tiny_pages).run(2, resume=False)
    # fresh engine instance + resume=True → starts at round 2
    eng2 = _new_engine(spark, cat_b, tiny_pages)
    assert cat_b.last_committed_round("crawl_log") == 1
    eng2.run(4, resume=True)
    assert _state(cat_b) == _state(cat4)


def test_crash_mid_round_replays_idempotently(spark, tiny_pages, cat4):
    """Crash after some tables committed but before crawl_log (the
    marker): resume must replay the round without double-appending."""
    cat_b = SnapshotCatalog(tempfile.mkdtemp(), spark)
    _new_engine(spark, cat_b, tiny_pages).run(2, resume=False)

    class Boom(RuntimeError):
        pass

    orig_write = SnapshotCatalog.write

    def crashing_write(self, table, df, **kw):
        if table == "crawl_log" and kw.get("round_no") == 2:
            raise Boom()  # crash before the round-2 commit marker
        return orig_write(self, table, df, **kw)

    SnapshotCatalog.write = crashing_write
    try:
        with pytest.raises(Boom):
            _new_engine(spark, cat_b, tiny_pages).run(3, resume=True)
    finally:
        SnapshotCatalog.write = orig_write

    # orphan snapshots exist for round 2, but the marker is absent
    assert cat_b.last_committed_round("crawl_log") == 1
    _new_engine(spark, cat_b, tiny_pages).run(3, resume=True)
    assert _state(cat_b) == _state(cat4, as_of=2)


def test_lineage_and_counters_recorded(cat4):
    hist = cat4.history("crawl_log")
    assert [h["round"] for h in hist] == [0, 1, 2, 3]
    for h in hist:
        c = h["counters"]
        assert c["popped"] >= c["fetched_ok"] >= 0
        assert c["search_fetches"] > 0
    # per-partition fetch lineage rows present
    assert any(
        entry["stage"] == "fetch" and entry["rows"] > 0
        for h in hist
        for entry in h["lineage"]
    )


def test_snapshot_time_travel(cat4):
    # seen as-of round 0 must be a strict subset of the current seen
    seen0 = {r["url_canon"] for r in cat4.read_as_of_round("seen", 0).collect()}
    seen3 = {r["url_canon"] for r in cat4.read("seen").collect()}
    assert seen0 < seen3
    # history ids strictly increase and dirs are shared across appends
    hist = cat4.history("seen")
    assert all(b["id"] > a["id"] for a, b in zip(hist, hist[1:]))
    assert set(hist[0]["dirs"]) <= set(hist[-1]["dirs"])


def test_expire_snapshots_keeps_current_readable(spark, tiny_pages):
    cat = SnapshotCatalog(tempfile.mkdtemp(), spark)
    _new_engine(spark, cat, tiny_pages).run(2, resume=False)
    before = {r["url_canon"] for r in cat.read("seen").collect()}
    cat.expire_snapshots("seen", keep=1)
    after = {r["url_canon"] for r in cat.read("seen").collect()}
    assert before == after
