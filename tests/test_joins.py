"""as-of join semantics on crafted rows: backward inclusive match,
no-match NULLs, tie visibility, and the DuckDB ASOF JOIN twin."""

from __future__ import annotations

import datetime as dt

import duckdb

from crawlspark.joins import asof_join, asof_join_sql


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(0), 100),   # before any right row -> NULL
            (1, _ts(5), 101),   # tie with right at :05 -> sees 50.0
            (1, _ts(9), 102),   # between :05 and :10 -> 50.0
            (1, _ts(30), 103),  # after last right -> 70.0
            (2, _ts(10), 200),  # key with no right rows -> NULL
        ],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(10), 60.0), (1, _ts(20), 70.0)],
        "user_id long, ts timestamp, px double",
    )
    got = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    }
    assert got == {100: None, 101: 50.0, 102: 50.0, 103: 70.0, 200: None}


def test_asof_vs_duckdb_native(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import pyspark.sql.functions as F

    left = ev.select("user_id", "ts", "event_id")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("px"))
    )
    got = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["px_asof"])
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    sql = asof_join_sql(
        "SELECT user_id, ts, event_id FROM events",
        "SELECT user_id, ts, max(value) AS px FROM events "
        "WHERE event_type = 'purchase' GROUP BY user_id, ts",
        on="user_id",
        value_cols=["px"],
        left_cols=["event_id"],
    )
    want = sorted(tuple(row) for row in con.execute(sql).fetchall())
    assert got == want
    assert len(got) > 0


def test_range_join_binned_equals_theta(spark):
    """The binned range join must equal the brute-force theta join on
    crafted intervals including bin-boundary values."""
    from crawlspark.joins import range_join_binned

    points = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100, 3)], "pid long, v double"
    )
    ranges = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 10.0, 16.0), (3, 15.0, 64.0), (4, 90.0, 99.0),
         (5, 200.0, 210.0)],  # no matches
        "range_id long, lo double, hi double",
    )
    got = {
        (r["pid"], r["range_id"])
        for r in range_join_binned(points, ranges, bin_width=16.0).collect()
    }
    want = {
        (p, rid)
        for p in range(0, 100, 3)
        for rid, lo, hi in [(1, 0, 10), (2, 10, 16), (3, 15, 64), (4, 90, 99)]
        if lo <= p <= hi
    }
    assert got == want
    assert (0, 1) in got and (96, 4) in got  # boundary containment
