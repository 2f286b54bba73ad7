"""Shared fixtures: one SparkSession per test session (startup ≈15 s),
tiny-scale fixture tables, and a DuckDB connection with the driver's
testdata registered as views."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from crawlspark.session import get_spark

    s = get_spark("crawlspark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_pages(spark):
    from crawlspark.fixtures import pages_df

    df = pages_df(spark, 42, "tiny").cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_pages_dict():
    from crawlspark.fixtures import gen_pages_rows

    return {r["url"]: r["html"] for r in gen_pages_rows(42, "tiny")}


@pytest.fixture(scope="session")
def cat4(spark, tiny_pages):
    """One 4-round engine run shared by resume/warehouse tests — the
    uninterrupted baseline (read as-of round k for k-round state)."""
    import tempfile

    from crawlspark.fixtures import gen_seeds, politeness_rows, robots_rows
    from crawlspark.scheduler import CrawlEngine
    from crawlspark.tableio import SnapshotCatalog

    cat = SnapshotCatalog(tempfile.mkdtemp(), spark)
    CrawlEngine(
        spark, cat, tiny_pages, gen_seeds("tiny"), politeness_rows(),
        robots_rows(42, "tiny"), round_seconds=600.0,
    ).run(4, resume=False)
    return cat


SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
