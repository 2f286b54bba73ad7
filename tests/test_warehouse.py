"""Warehouse-layer tests (SURVEY Q1-Q9, §5.3): natural-key upsert
semantics, enrichment jobs, and the nine analytics views cross-checked
against a DuckDB oracle on the same rows."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from crawlspark import warehouse


def test_natural_key_unique(cat4):
    jm = cat4.read("job_metadata")
    n = jm.count()
    assert n > 0
    assert jm.select(*warehouse.NATURAL_KEY).distinct().count() == n
    # id is deterministic over site+natural key → also unique
    assert jm.select("id").distinct().count() == n


def test_merge_keeps_latest_round(spark):
    rows = [
        # same natural key, rounds 0 and 2 → round 2 wins
        ("a", 1, "syd", "data engineer", "acme", "2024-01-01", "full time", 0, None),
        ("a2", 1, "syd", "data engineer", "acme", "2024-01-01", "full time", 2, None),
        # different key survives
        ("b", 1, "mel", "data engineer", "acme", "2024-01-01", "full time", 1, None),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, crawled_website_id int, location string, role string, "
        "company string, listed_date string, contract_type string, round int, "
        "job_idx int",
    )
    merged = warehouse.merge_job_metadata(None, df)
    got = {(r["url"], r["round"]) for r in merged.collect()}
    assert got == {("a2", 2), ("b", 1)}


def test_recrawl_upserts_not_duplicates(cat4):
    """Rotation repeats seeds across rounds; re-extracted postings must
    update in place (ON CONFLICT DO UPDATE, utils.py:214)."""
    jm = cat4.read("job_metadata")
    dup = (
        jm.groupBy(*warehouse.NATURAL_KEY).count().filter("count > 1").count()
    )
    assert dup == 0


def test_enrichment(spark):
    df = spark.createDataFrame(
        [
            ("1", "senior data engineer", None, None),
            ("2", "react developer", "uncategorized", "junior"),
            ("3", "ux designer", "data engineer", None),
        ],
        "id string, role string, extraction_role string, level string",
    )
    out = warehouse.enrich_level(warehouse.enrich_extraction_role(df))
    got = {r["id"]: (r["extraction_role"], r["level"]) for r in out.collect()}
    assert got["1"] == ("data engineer", "senior")
    assert got["2"] == ("frontend engineer", "junior")  # uncategorized → recompute
    assert got["3"] == ("data engineer", "mid-level")  # non-null kept


def test_views_match_duckdb(spark, cat4):
    jm = warehouse.enrich_extraction_role(cat4.read("job_metadata"))
    # give some rows salaries + skills so the views have work
    jm = jm.withColumn(
        "min_salary",
        F.when(F.length("id") % 3 == 0, F.lit(None)).otherwise(
            F.crc32(F.col("id")) % 100_000
        ).cast("int"),
    ).withColumn(
        "max_salary", (F.crc32(F.col("id")) % 150_000).cast("int")
    ).withColumn(
        "skills",
        F.when(
            F.size("skills") > 0, F.col("skills")
        ).otherwise(F.array(F.lit("python"), F.lit("sql"))),
    )
    warehouse.register_views(spark, jm)

    con = duckdb.connect()
    pdf = jm.toPandas()
    pdf["skills"] = pdf["skills"].map(list)
    con.register("job_metadata_raw", pdf)
    con.execute("CREATE TABLE job_metadata AS SELECT * FROM job_metadata_raw")
    con.execute(
        "CREATE VIEW skills AS SELECT id AS job_id, unnest(skills) AS skill "
        "FROM job_metadata"
    )

    def check(view, sql):
        got = sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {view}").collect())
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, view

    for view, role in warehouse.ROLE_SKILL_VIEWS.items():
        check(
            view,
            f"""WITH m AS (SELECT id FROM job_metadata WHERE searched_role = '{role}')
                SELECT A.id, B.skill FROM m A JOIN skills B ON A.id = B.job_id""",
        )
    check(
        "salary_skills",
        """WITH m AS (
             SELECT id, (COALESCE(max_salary,0)+COALESCE(min_salary,0))/2 AS salary
             FROM job_metadata
             WHERE min_salary IS NOT NULL AND max_salary IS NOT NULL)
           SELECT A.id, A.salary, B.skill FROM m A JOIN skills B ON A.id = B.job_id""",
    )
    check(
        "role_and_skills",
        """SELECT A.id, A.extraction_role, B.skill
           FROM (SELECT id, extraction_role FROM job_metadata) A
           JOIN skills B ON A.id = B.job_id""",
    )
    # Q5 dashboard aggregations
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT extraction_role, skill, count(*) AS n FROM role_and_skills "
            "GROUP BY extraction_role, skill"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """SELECT A.extraction_role, B.skill, count(*) AS n
               FROM job_metadata A JOIN skills B ON A.id = B.job_id
               GROUP BY A.extraction_role, B.skill"""
        ).fetchall()
    )
    assert got == want


def test_bucketed_merge_untouched_buckets_immutable(cat4):
    """The bucketed upsert must rewrite ONLY buckets holding a round's
    new natural keys: any bucket whose dir pointer is inherited across
    rounds references the exact same immutable files (byte-identical by
    construction); at least some buckets must be inherited (rotation
    means rounds touch different key subsets), and the composed table
    still passes the natural-key invariants."""
    import hashlib
    import os

    hist = cat4.history("job_metadata")
    by_round = {e["round"]: e for e in hist if e.get("buckets")}
    assert len(by_round) >= 2, "engine rounds should commit bucketed snapshots"
    rounds = sorted(by_round)
    inherited = 0
    tdir = os.path.join(cat4.root, "job_metadata")
    for r0, r1 in zip(rounds, rounds[1:]):
        b0, b1 = by_round[r0]["buckets"], by_round[r1]["buckets"]
        for k, d in b1.items():
            if b0.get(k) == d:
                inherited += 1
                # same pointer → same physical files, still present
                full = os.path.join(tdir, d)
                assert os.path.isdir(full)
                files = sorted(
                    f for f in os.listdir(full) if f.endswith(".parquet")
                )
                assert files
                hashlib.sha256(
                    open(os.path.join(full, files[0]), "rb").read()
                ).hexdigest()  # readable bytes
    assert inherited > 0, "no bucket was ever inherited — merge is O(table)"
    # the inherited layout must not have lost or duplicated any key
    jm = cat4.read("job_metadata")
    assert jm.select(*warehouse.NATURAL_KEY).distinct().count() == jm.count()


def test_seek_jora_skills_and_salary_populated(cat4):
    """S13-replacement gate: seek/jora rows (website ids 2/1) must
    carry deterministically-extracted skills, and seek pages whose
    info spans include the salary range must land validated salaries —
    the analytics views are populated by all three sites, not just
    CareerOne (the reference fills these via its LLM agent)."""
    jm = cat4.read("job_metadata")
    sj = jm.filter(F.col("crawled_website_id").isin(1, 2))
    n = sj.count()
    assert n > 0
    assert sj.filter(F.size("skills") > 0).count() > 0
    with_salary = sj.filter(F.col("min_salary").isNotNull())
    assert with_salary.count() > 0
    # extracted salaries went through the C10 chain (capped, min==max
    # per the faithful max:=min quirk on the range path)
    bad = with_salary.filter(
        (F.col("min_salary") >= 1_000_000) | (F.col("min_salary") < 0)
    ).count()
    assert bad == 0


def test_seek_jora_experience_and_working_right_extracted(cat4):
    """S13 remaining fields (round 3): the fixture descriptions carry
    "N(+) years" and sponsorship phrases on a deterministic subset, so
    seek/jora metadata must show extracted experience values (> 0),
    site defaults (-1 seek / 1 jora) on phrase-free pages, and both
    True and False working-rights flags."""
    jm = cat4.read("job_metadata")
    sj = jm.filter(F.col("crawled_website_id").isin(1, 2))
    assert sj.filter(F.col("number_of_experience") > 1).count() > 0
    # default still happens on pages with no experience phrase
    assert sj.filter(F.col("number_of_experience").isin(-1, 1)).count() > 0
    wr = {r["is_working_right"] for r in sj.select("is_working_right").distinct().collect()}
    assert wr == {True, False}


def test_merge_incremental_equals_batch_random(spark):
    """Randomized upsert associativity (round 5): folding
    merge_job_metadata round-by-round must equal one merge of all rows
    at once, and both must equal a pure-Python keep-max oracle over
    (round desc, url desc, job_idx desc nulls last) per natural key —
    the property the O(touched) bucketed merge relies on across an
    arbitrary round history."""
    import random

    rng = random.Random(0xBEEF)
    schema = (
        "url string, crawled_website_id int, location string, role string, "
        "company string, listed_date string, contract_type string, "
        "round int, job_idx int"
    )
    locs, roles = ["syd", "mel", "bne"], ["de", "ds", "swe"]
    batches, url_n = [], 0
    for rnd in range(4):
        rows = []
        for _ in range(40):
            rows.append((
                f"u{url_n}",
                rng.choice([1, 2, -1]),
                rng.choice(locs),
                rng.choice(roles),
                "acme" if rng.random() < 0.7 else "globex",
                rng.choice(["2024-01-01", "2024-02-02"]),
                "full time",
                rnd,
                rng.choice([None, 0, 1, 2]),
            ))
            url_n += 1
        batches.append(rows)

    # pure-Python oracle: per natural key keep the max of the total
    # order (round, url, job_idx with NULL smallest)
    def okey(r):
        return (r[1], r[2], r[3], r[4], r[5], r[6])

    def rank(r):
        return (r[7], r[0], (r[8] is not None, r[8] if r[8] is not None else 0))

    best = {}
    for rows in batches:
        for r in rows:
            k = okey(r)
            if k not in best or rank(r) > rank(best[k]):
                best[k] = r
    want = {r[0] for r in best.values()}

    # incremental fold
    acc = None
    for rows in batches:
        acc = warehouse.merge_job_metadata(acc, spark.createDataFrame(rows, schema))
    got_inc = {r["url"] for r in acc.collect()}
    # one-shot batch
    all_rows = [r for rows in batches for r in rows]
    got_all = {
        r["url"]
        for r in warehouse.merge_job_metadata(
            None, spark.createDataFrame(all_rows, schema)
        ).collect()
    }
    assert got_inc == want
    assert got_all == want
