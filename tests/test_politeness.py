"""Politeness operators: robots longest-prefix-match Column expression
vs the pure-Python decision, capacity math, and the two-stage salted
frontier pop vs a naive single-window oracle (SURVEY F-G/F-H)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawlspark.politeness import (
    DISCOVERY_KEY,
    capacity_df,
    pop_per_host,
    robots_allowed,
)
from crawlspark.simulator import robots_decision

RULES = [
    {"allow": True, "path_prefix": "/"},
    {"allow": False, "path_prefix": "/private/"},
    {"allow": True, "path_prefix": "/private/ok/"},
    {"allow": False, "path_prefix": "/apply/"},
]

PATHS = [
    "/", "/jobs/1", "/private/", "/private/x", "/private/ok/1",
    "/apply/9", "/applyx", "/private", "/PRIVATE/x",
]


def test_robots_column_matches_pure(spark):
    rows = [(p, [(r["allow"], r["path_prefix"]) for r in RULES]) for p in PATHS]
    rows.append(("/anything", None))
    rows.append(("/anything", []))
    df = spark.createDataFrame(
        rows,
        "path string, rules array<struct<allow:boolean,path_prefix:string>>",
    ).select(
        "path", "rules",
        robots_allowed(F.col("path"), F.col("rules")).alias("allowed"),
    )
    for r in df.collect():
        rules = (
            None
            if r["rules"] is None
            else [{"allow": x["allow"], "path_prefix": x["path_prefix"]} for x in r["rules"]]
        )
        assert r["allowed"] == robots_decision(rules, r["path"]), (r["path"], rules)


def test_capacity(spark):
    pol = spark.createDataFrame(
        [("a.example", 5.0, 4), ("b.example", 3.0, 2)],
        "host string, delay_s double, max_concurrency int",
    )
    rob = spark.createDataFrame(
        [("a.example", 2.0), ("c.example", 10.0)], "host string, crawl_delay double"
    )
    got = {r["host"]: r["capacity"] for r in capacity_df(pol, rob, 600.0).collect()}
    # crawl_delay overrides delay_s; defaults: delay 1s, concurrency 2
    assert got == {"a.example": 300 * 4, "b.example": 200 * 2, "c.example": 60 * 2}


def _skewed_candidates(spark, n_hot=5_000, n_cold_hosts=50):
    hot = spark.range(n_hot).select(
        F.lit("hot.example").alias("host"),
        F.lit(0).alias("disc_round"),
        (F.col("id") % 13).cast("int").alias("seed_idx"),
        (F.col("id") % 7).cast("int").alias("depth"),
        F.col("id").cast("int").alias("link_idx"),
    )
    cold = spark.range(n_cold_hosts * 10).select(
        F.concat(F.lit("cold"), (F.col("id") % n_cold_hosts), F.lit(".example")).alias("host"),
        F.lit(0).alias("disc_round"),
        F.lit(0).alias("seed_idx"),
        F.lit(0).alias("depth"),
        F.col("id").cast("int").alias("link_idx"),
    )
    return hot.unionByName(cold)


def test_pop_per_host_matches_naive_window(spark):
    cand = _skewed_candidates(spark).cache()
    budget = spark.createDataFrame(
        [("hot.example", 100), ("cold0.example", 3)], "host string, remaining long"
    )
    got = pop_per_host(cand, budget, salt_shards=8, default_remaining=5)
    # naive oracle: one global window per host
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in DISCOVERY_KEY])
    naive = (
        cand.join(budget, "host", "left")
        .withColumn("remaining", F.coalesce("remaining", F.lit(5)))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("popped", F.col("_rn") <= F.col("remaining"))
    )
    key = lambda r: (r["host"], r["disc_round"], r["seed_idx"], r["depth"], r["link_idx"])  # noqa: E731
    got_popped = {key(r) for r in got.filter("popped").collect()}
    naive_popped = {key(r) for r in naive.filter("popped").collect()}
    assert got_popped == naive_popped
    assert got.count() == cand.count()  # nothing lost or duplicated
    # budget respected
    per_host = (
        got.filter("popped").groupBy("host").count().collect()
    )
    for r in per_host:
        cap = {"hot.example": 100, "cold0.example": 3}.get(r["host"], 5)
        assert r["count"] <= cap


def test_pop_per_host_random_budgets_vs_naive(spark):
    """Randomized boundary stress (round 5): seeded random host sizes
    and budgets hitting every fast-path/contended boundary — remaining
    = 0, count == remaining (uncontended by exactly one), count ==
    remaining + 1 (minimally contended), budget ≫ count, and hosts
    absent from the budget dim (default applies) — must match the
    naive single-window oracle exactly, with no row lost or duplicated
    and every per-host cap respected."""
    import random

    rng = random.Random(0xF40)
    rows, budgets = [], []
    link = 0
    for h in range(24):
        host = f"h{h}.example"
        n = rng.choice([1, 2, 3, 5, 8, 20, 60])
        for _ in range(n):
            rows.append((host, rng.randrange(3), rng.randrange(13),
                         rng.randrange(7), link))
            link += 1
        case = h % 6
        if case == 0:
            budgets.append((host, 0))
        elif case == 1:
            budgets.append((host, n))        # count == remaining
        elif case == 2:
            budgets.append((host, max(n - 1, 0)))  # minimally contended
        elif case == 3:
            budgets.append((host, n + 50))   # budget >> count
        elif case == 4:
            budgets.append((host, rng.randrange(1, n + 1)))
        # case 5: absent from budget — default_remaining applies
    cand = spark.createDataFrame(
        rows, "host string, disc_round int, seed_idx int, depth int, link_idx int"
    )
    budget = spark.createDataFrame(budgets, "host string, remaining long")

    got = pop_per_host(cand, budget, salt_shards=4, default_remaining=2)

    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in DISCOVERY_KEY])
    naive = (
        cand.join(budget, "host", "left")
        .withColumn("remaining", F.coalesce("remaining", F.lit(2)))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("popped", F.col("_rn") <= F.col("remaining"))
    )
    key = lambda r: (r["host"], r["disc_round"], r["seed_idx"], r["depth"], r["link_idx"])  # noqa: E731
    assert {key(r) for r in got.filter("popped").collect()} == {
        key(r) for r in naive.filter("popped").collect()
    }
    assert got.count() == len(rows)
    caps = dict(budgets)
    for r in got.filter("popped").groupBy("host").count().collect():
        assert r["count"] <= caps.get(r["host"], 2), r["host"]
