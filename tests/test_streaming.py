"""Structured Streaming surface: availableNow drains must equal the
batch equivalents (batch output is the streaming oracle)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from crawlspark import streaming as ST

SF_DIR = "/root/testdata/sf0.001"


def test_stream_events_equals_batch(spark, tmp_path):
    # stage the events parquet as a stream-source directory
    src_dir = str(tmp_path / "events_src")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.parquet(src_dir)

    out = ST.stream_events(spark, src_dir)
    ST.run_available_now(out, "ev_agg", str(tmp_path / "ckpt"))
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM ev_agg").collect()
    }

    batch = (
        spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
        )
    )
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["s"])
        for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_crawl_log_follows_catalog(spark, cat4, tmp_path):
    out = ST.stream_crawl_log(spark, cat4.root)
    ST.run_available_now(out, "log_agg", str(tmp_path / "ckpt2"))
    got = {
        (r["round"], r["host"]): (r["fetches"], r["failures"])
        for r in spark.sql("SELECT * FROM log_agg").collect()
    }
    # batch oracle: append-mode snapshots each hold only their round's
    # delta, so the snap-* union IS the full table (no overlap)
    raw = spark.read.schema(ST.CRAWL_LOG_SCHEMA).parquet(
        os.path.join(cat4.root, "crawl_log", "snap-*")
    )
    want = {
        (r["round"], r["host"]): (r["fetches"], r["failures"])
        for r in raw.groupBy("round", "host")
        .agg(
            F.count("*").alias("fetches"),
            F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failures"),
        )
        .collect()
    }
    assert got == want
    assert any(f > 0 for f, _ in got.values())


def test_stream_crawl_log_ignores_orphan_snapshot(spark, cat4, tmp_path):
    """An orphan snap-* dir from a crashed, never-committed round must
    NOT be ingested (the recovery contract says it is never referenced
    again): the stream source filters the file glob against the
    manifest's committed dir set (ADVICE r2)."""
    import shutil

    log_dir = os.path.join(cat4.root, "crawl_log")
    committed = sorted(d for d in os.listdir(log_dir) if d.startswith("snap-"))
    orphan = os.path.join(log_dir, "snap-999999")
    shutil.copytree(os.path.join(log_dir, committed[0]), orphan)
    try:
        out = ST.stream_crawl_log(spark, cat4.root)
        ST.run_available_now(out, "log_agg_orphan", str(tmp_path / "ckpt_orph"))
        got = {
            (r["round"], r["host"]): (r["fetches"], r["failures"])
            for r in spark.sql("SELECT * FROM log_agg_orphan").collect()
        }
        raw = spark.read.schema(ST.CRAWL_LOG_SCHEMA).parquet(
            *[os.path.join(log_dir, d) for d in committed]
        )
        want = {
            (r["round"], r["host"]): (r["fetches"], r["failures"])
            for r in raw.groupBy("round", "host")
            .agg(
                F.count("*").alias("fetches"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failures"),
            )
            .collect()
        }
        assert got == want  # double-counting would inflate fetches
    finally:
        shutil.rmtree(orphan)


def test_tableio_append_onto_bucketed_raises(spark, tmp_path):
    """Mixing write modes on one table is an unguarded data-loss hazard
    (append composes only base['dirs'], dropping bucketed rows) — the
    catalog must refuse (ADVICE r2)."""
    import pytest as _pytest

    from crawlspark.tableio import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("_bucket")
    )
    cat.write_bucketed("t", df, touched=[0, 1, 2, 3], round_no=0)
    with _pytest.raises(ValueError, match="bucketed"):
        cat.write("t", spark.range(5).select("id"), round_no=1, mode="append")


def test_stream_host_health_stateful(spark, cat4, tmp_path):
    """applyInPandasWithState across triggers: the final per-host state
    (total fetches, failures, consecutive-failure streak) must equal a
    pure-Python fold over the canonically-ordered crawl log."""
    out = ST.stream_host_health(spark, cat4.root)
    ST.run_available_now(
        out, "health", str(tmp_path / "ckpt3"), output_mode="update"
    )
    # update mode emits one row per host per trigger; the final state
    # is the row with the highest total (collect order across batches
    # is NOT guaranteed — don't rely on it)
    rows = spark.sql("SELECT * FROM health").collect()
    got = {}
    for r in rows:
        cur = got.get(r["host"])
        if cur is None or r["total"] > cur[0]:
            got[r["host"]] = (r["total"], r["failures"], r["fail_streak"])

    raw = (
        spark.read.schema(ST.CRAWL_LOG_SCHEMA)
        .parquet(os.path.join(cat4.root, "crawl_log", "snap-*"))
        .collect()
    )
    ordered = sorted(
        raw,
        key=lambda r: (
            r["round"], 0 if r["phase"] == "search" else 1,
            r["seed_idx"], r["depth"], r["link_idx"],
        ),
    )
    want = {}
    for r in ordered:
        t, f, s = want.get(r["host"], (0, 0, 0))
        t += 1
        if r["ok"]:
            s = 0
        else:
            f += 1
            s += 1
        want[r["host"]] = (t, f, s)
    assert got == want
    assert len(got) > 0
    assert sum(f for _, f, _ in got.values()) > 0, "fixture has dead links"


def test_stream_sessions_equals_batch(spark, tmp_path):
    """Session-window streaming agg (availableNow drain) must equal the
    batch session_window aggregation on the same files."""
    src_dir = str(tmp_path / "events_sess")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.parquet(src_dir)

    out = ST.stream_sessions(spark, src_dir)
    ST.run_available_now(out, "sess_agg", str(tmp_path / "ckpt_sess"))
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_agg").collect()
    )
    batch = (
        spark.read.parquet(src_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    want = sorted(
        (r["user_id"], r["w"]["start"], r["w"]["end"], r["n"])
        for r in batch.collect()
    )
    assert got == want
    assert len(got) > 0


def test_stream_dedup_equals_batch_distinct(spark, tmp_path):
    src_dir = str(tmp_path / "ev_dd_src")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.parquet(src_dir)
    out = ST.stream_dedup(spark, src_dir)
    ST.run_available_now(out, "dd1", str(tmp_path / "ckpt_dd"), output_mode="append")
    got = {
        (r["user_id"], r["event_type"])
        for r in spark.sql("SELECT * FROM dd1").collect()
    }
    want = {
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(src_dir).select("user_id", "event_type").distinct().collect()
    }
    assert got == want and len(got) > 0
    # emitted exactly once per key (no duplicate emissions across batches)
    assert spark.sql("SELECT count(*) AS n FROM dd1").collect()[0]["n"] == len(want)


def test_stream_dedup_state_survives_across_polls(spark, tmp_path):
    """A key seen in poll 1 must NOT re-emit in poll 2 — the dedup
    state is carried in the checkpoint, not per-drain."""
    src_dir = str(tmp_path / "ev_dd2_src")
    os.makedirs(src_dir)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200).cache()
    ckpt = str(tmp_path / "ckpt_dd2")

    sink = str(tmp_path / "dd2_out")

    def drain():
        # memory sinks cannot recover a checkpoint — use a file sink,
        # the recoverable shape a real monitoring pipeline would use
        q = (
            ST.stream_dedup(spark, src_dir)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ev.write.mode("append").parquet(src_dir)
    drain()
    n_distinct = ev.select("user_id", "event_type").distinct().count()
    assert spark.read.parquet(sink).count() == n_distinct

    # append the SAME rows again: poll 2 must emit zero new rows
    ev.write.mode("append").parquet(src_dir)
    drain()
    assert spark.read.parquet(sink).count() == n_distinct


def test_stream_crawl_log_per_poll_rebuild_sees_new_rounds(spark, tiny_pages, tmp_path):
    """The committed-snapshot filter is frozen when the stream is built
    (ADVICE r3), so the module contract is REBUILD-PER-POLL: a fresh
    stream_crawl_log over the same checkpoint must (a) pick up rounds
    committed after the previous poll's stream was built and (b) read
    only the NEW snapshots' files (checkpoint-incremental), not re-scan
    the old ones."""
    import tempfile as _tf

    from crawlspark.fixtures import gen_seeds, politeness_rows, robots_rows
    from crawlspark.scheduler import CrawlEngine
    from crawlspark.tableio import SnapshotCatalog

    cat = SnapshotCatalog(_tf.mkdtemp(), spark)
    mk = lambda: CrawlEngine(
        spark, cat, tiny_pages, gen_seeds("tiny"), politeness_rows(),
        robots_rows(42, "tiny"), round_seconds=600.0,
    )
    mk().run(2, resume=False)
    log_glob = os.path.join(cat.root, "crawl_log", "snap-*")
    raw1 = spark.read.schema(ST.CRAWL_LOG_SCHEMA).parquet(log_glob)
    rounds1, n_rows1 = (
        {r["round"] for r in raw1.select("round").distinct().collect()},
        raw1.count(),
    )

    ckpt = str(tmp_path / "ckpt_poll")
    q1 = ST.run_available_now(ST.stream_crawl_log(spark, cat.root), "log_poll1", ckpt)
    got1 = {r["round"] for r in spark.sql("SELECT DISTINCT round FROM log_poll1").collect()}
    assert got1 == rounds1

    # two MORE rounds commit after poll 1's stream was built
    # (run(n) is the TOTAL round count; resume continues from round 2)
    mk().run(4, resume=True)
    raw2 = spark.read.schema(ST.CRAWL_LOG_SCHEMA).parquet(log_glob)
    rounds2, n_rows2 = (
        {r["round"] for r in raw2.select("round").distinct().collect()},
        raw2.count(),
    )
    assert rounds2 > rounds1  # the engine really added rounds

    # per-poll contract: rebuild the stream; the shared checkpoint
    # makes the poll incremental
    q2 = ST.run_available_now(ST.stream_crawl_log(spark, cat.root), "log_poll2", ckpt)
    got2 = {r["round"] for r in spark.sql("SELECT DISTINCT round FROM log_poll2").collect()}
    assert got2 == rounds2
    poll2_input = sum(p["numInputRows"] for p in q2.recentProgress)
    assert poll2_input == n_rows2 - n_rows1  # only the delta files read


def test_stream_crawl_log_live_single_query_sees_new_rounds(
    spark, tiny_pages, tmp_path
):
    """The CONTINUOUS monitor (VERDICT r4 next #3): one long-running
    query — never rebuilt — must (a) report rounds committed after it
    started, (b) exclude orphan snap dirs, and (c) never double-count
    (per-(round, host) totals equal the batch aggregation over exactly
    the committed dirs)."""
    import shutil
    import time as _time

    from crawlspark.fixtures import gen_seeds, politeness_rows, robots_rows
    from crawlspark.scheduler import CrawlEngine
    from crawlspark.tableio import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    mk = lambda: CrawlEngine(
        spark, cat, tiny_pages, gen_seeds("tiny"), politeness_rows(),
        robots_rows(42, "tiny"), round_seconds=600.0,
    )
    mk().run(2, resume=False)
    log_dir = os.path.join(cat.root, "crawl_log")
    # orphan dir from a "crashed" round: present on disk, never in the
    # manifest — the monitor must never ingest it
    committed0 = sorted(d for d in os.listdir(log_dir) if d.startswith("snap-"))
    shutil.copytree(
        os.path.join(log_dir, committed0[0]), os.path.join(log_dir, "snap-999999")
    )

    def batch_want():
        dirs = ST._committed_data_dirs(cat.root, "crawl_log")
        raw = spark.read.schema(ST.CRAWL_LOG_SCHEMA).parquet(
            *[os.path.join(log_dir, d) for d in sorted(dirs)]
        )
        return {
            (r["round"], r["host"]): (r["fetches"], r["failures"])
            for r in raw.groupBy("round", "host")
            .agg(
                F.count("*").alias("fetches"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failures"),
            )
            .collect()
        }

    out_dir = str(tmp_path / "live_out")

    def live_got(expect_rounds):
        deadline = _time.time() + 90
        got = {}
        while _time.time() < deadline:
            try:
                got = {
                    (r["round"], r["host"]): (r["fetches"], r["failures"])
                    for r in ST.read_crawl_log_live(spark, out_dir).collect()
                }
            except Exception:
                got = {}
            if {k[0] for k in got} >= expect_rounds:
                return got
            _time.sleep(0.5)
        return got

    q = ST.stream_crawl_log_live(
        spark, cat.root, out_dir, str(tmp_path / "live_ckpt")
    )
    try:
        got1 = live_got({0, 1})
        assert {k[0] for k in got1} == {0, 1}
        assert got1 == batch_want()

        # two MORE rounds commit while the SAME query keeps running
        mk().run(4, resume=True)
        got2 = live_got({0, 1, 2, 3})
        assert {k[0] for k in got2} == {0, 1, 2, 3}
        assert got2 == batch_want()  # exact equality ⇒ no double count
    finally:
        q.stop()
