"""Physical-plan shape assertions — the scale claims in docs/SCALE.md
pinned as tests so a refactor cannot silently regress them."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _final_plan(df) -> str:
    # AQE defers the physical tree until execution — and a .write
    # would execute a NEW QueryExecution, so collect() THIS frame,
    # then read its finalized AdaptiveSparkPlan with codegen nodes
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_spread_scan_preserves_filter_pushdown(spark):
    """_t repartitions an under-partitioned scan; predicate pushdown
    and column pruning must still reach the parquet scan through the
    Repartition node."""
    df = (
        E._t(spark, SF_DIR, "lineitem")
        .where(F.col("l_quantity") > 40)
        .select("l_orderkey")
    )
    plan = _plan(df)
    assert "GreaterThan(l_quantity" in plan, plan
    # pruned read schema: only the two referenced columns are scanned
    assert "l_comment" not in plan
    assert "l_orderkey" in plan and "l_quantity" in plan


def test_spread_scan_spreads_small_scan(spark):
    df = E._t(spark, SF_DIR, "documents")
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_join_orders_customer_broadcasts_dim(spark):
    """Q2/S7: the small dimension side must broadcast — a shuffle of
    the fact side on the join key would be the 100 TB bottleneck."""
    plan = _plan(E.queries()["join_orders_customer"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_codegen_covers_scalar_chain(spark):
    """C5/C6 CASE chains stay inside whole-stage codegen (the '*'
    prefix in the executed plan) — an interpreted fallback would be
    the silent per-row cost at scale."""
    plan = _final_plan(E.queries()["role_enrichment"](spark, SF_DIR))
    # the '*(n)' prefix is WholeStageCodegenExec's toString marker
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, plan


def test_minhash_band_join_has_no_cartesian(spark):
    plan = _plan(E.queries()["dedup_minhash_lsh"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spread_gate_leaves_small_scans_alone(spark):
    """Round-4 gate: shuffle-light tables (events/orders/...) must NOT
    pay the spread exchange — it was pure overhead (the r3 ~2×
    small-query regressions). Per-row-heavy tables still spread."""
    ev = E._t(spark, SF_DIR, "events")
    assert ev.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    # explicit opt-in still works (Arrow canonicalizer over events)
    ev_spread = E._t(spark, SF_DIR, "events", spread=True)
    assert (
        ev_spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_corpus_pipeline_has_no_cartesian(spark):
    """The 7-stage flagship DAG (incl. LSH band join + components) must
    never fall back to a cartesian/BNL join."""
    plan = _plan(E.queries()["corpus_pipeline"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_media_profile_scan_prunes_to_consumed_columns(spark):
    """The media operators project to (media_id, payload) BEFORE the
    mapInPandas — otherwise the UDF's full-row input schema forces the
    parquet scan to read lang/source just to build a meta struct the
    kernel never decodes."""
    plan = _plan(E.queries()["media_features"](spark, SF_DIR))
    assert "struct<doc_id:bigint,text:string>" in plan, plan
    assert "source" not in plan.split("ReadSchema")[1][:120]
