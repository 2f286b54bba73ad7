"""The benchmarked detail pipeline must be semantically exact, not
just fast: its extracted-URL set equals the pure-Python computation
(all pages − synthetic seen − robots-disallowed), independent of the
bloom/salt/join strategies it benchmarks."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from crawlspark.fixtures import gen_pages_rows, robots_rows
from crawlspark.pipeline_bench import run_detail_pipeline
from crawlspark.simulator import robots_decision
from crawlspark.urlnorm import canonicalize, host_of, path_after_host


def _crc32(s: str) -> int:
    return zlib.crc32(s.encode())


def test_pipeline_count_matches_pure_python(spark, tiny_pages):
    robots = robots_rows(42, "tiny")
    robots_df = spark.createDataFrame(
        [
            (r["host"], [(bool(x["allow"]), x["path_prefix"]) for x in r["rules"]])
            for r in robots
        ],
        "host string, rules array<struct<allow:boolean,path_prefix:string>>",
    )
    got = run_detail_pipeline(spark, tiny_pages, robots_df)

    by_host = {r["host"]: r["rules"] for r in robots}
    all_urls = [r["url"] for r in gen_pages_rows(42, "tiny")]
    seen_canon = {
        canonicalize(u) for u in all_urls if _crc32(u) % 5 == 0
    }
    want = 0
    for url in all_urls:
        if canonicalize(url) in seen_canon:
            continue  # F-D: seen keys are canonical URLs
        if not robots_decision(by_host.get(host_of(url)), path_after_host(url)):
            continue
        want += 1
    assert got == want


def test_pipeline_bloom_off_identical(spark, tiny_pages):
    robots_df = spark.createDataFrame(
        [("www.seek.com.au", [(True, "/"), (False, "/apply/")])],
        "host string, rules array<struct<allow:boolean,path_prefix:string>>",
    )
    a = run_detail_pipeline(spark, tiny_pages, robots_df, use_bloom=True)
    b = run_detail_pipeline(spark, tiny_pages, robots_df, use_bloom=False)
    assert a == b
