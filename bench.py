"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the crawl detail-pipeline throughput
(the north metric, URLs/s) on the materialized "small" fixture.

Protocol (round-3 fix for cross-round comparability, VERDICT r2 #2;
round-5 stat switch, VERDICT r4 next #6): every query runs REPS times
after a session warm-up and reports the MEDIAN time — min overstates
sustained throughput on this drift-prone VM (ADVICE r3), so as of r5
the headline "value" and per-query "queries" are medians; best-of-REPS
stays alongside ("value_min" in the line, "mins" in the samples file)
so r≤4 min-basis numbers remain comparable. The crawl pipeline gets
the same treatment: one discarded warm-up pass, then REPS timed runs.

Prints ONE COMPACT JSON line as the LAST line of stdout (the driver's
tail capture is ~2000 chars — keep this line well under that; r3
inlined per-run samples and overflowed it, VERDICT r3 wrong #2):
  {"metric": ..., "value": total_median_sec, "value_min": ...,
   "unit": "sec", "queries": {name: median_sec, ...},
   "corpus_pipeline_stages": {stage: sec, ...},
   "protocol": {"reps": R, "stat": "median", "warmup": true},
   "sf": ..., "crawl": {"urls": N, "sec": t, "urls_per_s": r},
   "cpu_marker_md5_per_s": [...], "cpus": N,
   "samples_file": "BENCH/samples_latest.json"}

Per-run samples, per-query mins, and the stage split all go to
BENCH/samples_latest.json. corpus_pipeline_stages attributes the
flagship's wall time to its 7 stages (checkpoint-per-boundary run —
attribution, not a second headline; VERDICT r4 next #1).

Brute-force O(n²) pair queries are excluded from the headline set at
bench scale (their LSH/banded scale-path variants ARE included); they
remain in the sf0.01 correctness gate.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

HEADLINE = [
    "url_canonicalize",
    "frontier_dedup",
    "frontier_pop",
    "politeness_capacity",
    "robots_gate",
    "listed_date_convert",
    "role_enrichment",
    "salary_validation",
    "desc_extract",
    "asof_join_events",
    "range_join_events",
    "upsert_latest",
    "topk_per_group",
    "windowed_events",
    "rollup_revenue",
    "cube_revenue",
    "set_ops",
    "pivot_events",
    "sessionize",
    "lag_delta",
    "distinct_agg",
    "percentile_stats",
    "props_extract",
    "agg_pricing_summary",
    "join_orders_customer",
    "salary_projection",
    "postings_per_day",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "text_quality_langid",
    "pii_redact",
    "quality_repetition",
    "boilerplate_remove",
    "hash_sample",
    "tfidf_topterms",
    "corpus_pipeline",
    "doc_fingerprint",
    "winnow_fingerprint",
    "media_features",  # one-pass profile: features + resize + frames
]


def _force(df) -> int:
    """Force full computation of every column (count() alone lets
    Catalyst prune projections/UDFs)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def _cpu_marker(sec: float = 1.5) -> int:
    """Single-thread md5 throughput — this sandbox VM's per-core clock
    drifts ±30%+ on a minutes scale (docs/SCALE.md), so absolute
    wall times are only comparable across rounds relative to the
    marker. Reported at start and end of the run."""
    import hashlib

    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < sec:
        hashlib.md5(str(n).encode()).hexdigest()
        n += 1
    return round(n / (time.perf_counter() - t0))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from crawlspark.fixtures import robots_rows
    from crawlspark.pipeline_bench import (
        measure_throughput,
        write_small_pages_parquet,
    )
    from crawlspark.session import get_spark

    spark = get_spark("crawlspark-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    marker_start = _cpu_marker()

    # warm-up: JVM codegen + python UDF workers, so query timings
    # measure the operators rather than session spin-up
    _force(qs["url_canonicalize"](spark, sf_dir))
    _force(qs["media_features"](spark, sf_dir))  # spins the Arrow workers

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        samples[name] = runs
        timings[name] = min(runs)

    # stage-split attribution for the flagship (VERDICT r4 next #1):
    # same 7-stage DAG with an eager checkpoint per boundary, so a
    # cross-round regression in any ONE stage is visible. The split
    # total exceeds the one-DAG headline time by the checkpoint
    # overhead — attribution only, not a second headline.
    pipeline_stages = entry.corpus_pipeline_staged(spark, sf_dir)

    # crawl-pipeline throughput (north metric) on materialized parquet
    pages_path = os.path.join(
        tempfile.gettempdir(), "crawlspark_bench_pages_small.parquet"
    )
    if not os.path.exists(pages_path):
        write_small_pages_parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    robots_df = spark.createDataFrame(
        [
            (r["host"], [(bool(x["allow"]), x["path_prefix"]) for x in r["rules"]])
            for r in robots_rows(42, "small")
        ],
        "host string, rules array<struct<allow:boolean,path_prefix:string>>",
    )
    measure_throughput(spark, pages, robots_df)  # discarded warm-up pass
    crawl_runs = [measure_throughput(spark, pages, robots_df) for _ in range(reps)]
    n_urls, crawl_sec_min = min(crawl_runs, key=lambda t: t[1])

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return round(s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2, 3)

    medians = {n: _median(rs) for n, rs in samples.items()}
    crawl_secs = [round(t, 3) for _, t in crawl_runs]
    crawl_sec = _median(crawl_secs)
    total_min = round(sum(timings.values()) + crawl_sec_min, 3)
    total_median = round(sum(medians.values()) + crawl_sec, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    markers = [marker_start, _cpu_marker()]

    # full per-run evidence → file (inlining it in the stdout line
    # overflowed the driver's tail capture in r3)
    samples_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "samples_latest.json")
    os.makedirs(os.path.dirname(samples_path), exist_ok=True)
    with open(samples_path, "w") as f:
        json.dump(
            {
                "samples": samples,
                "medians": medians,
                "mins": timings,
                "corpus_pipeline_stages": pipeline_stages,
                "crawl_samples": crawl_secs,
                "protocol": {"reps": reps, "stat": "median", "warmup": True},
                "sf": sf_val,
                "cpus": cpus,
                "cpu_marker_md5_per_s": markers,
            },
            f,
            indent=1,
        )

    print(
        json.dumps(
            {
                "metric": "headline suite + crawl detail-pipeline wall time",
                "value": total_median,
                "value_min": total_min,
                "unit": "sec",
                "queries": medians,
                "corpus_pipeline_stages": pipeline_stages,
                "protocol": {"reps": reps, "stat": "median", "warmup": True},
                "sf": sf_val,
                "crawl": {
                    "urls": n_urls,
                    "sec": round(crawl_sec, 3),
                    "urls_per_s": round(n_urls / crawl_sec, 1),
                },
                "cpu_marker_md5_per_s": markers,
                "cpus": cpus,
                "samples_file": "BENCH/samples_latest.json",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
