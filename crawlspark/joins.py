"""Custom join operators Spark's API lacks as built-ins.

``asof_join`` — for each left row, attach the single most recent right
row (right.ts ≤ left.ts) per key: the standard point-in-time join of
event pipelines (price-as-of-trade, config-as-of-crawl). The reference
has no such operator (SURVEY §2.6 — no non-equi joins anywhere); this
is a beyond-reference engine primitive.

Physical strategy (the scale-correct construction, NOT a theta join):
tag and union the two inputs, then one window pass per key ordered by
(ts, side) with ``last(value, ignorenulls=True)`` carrying the latest
right-side payload forward onto left rows. Cost = one shuffle on the
key (both inputs co-partitioned by it) + one ordered scan — no
candidate explosion, no O(|L|·|R|) stage, skew bounded by the hottest
key like any keyed window. DuckDB's native ASOF JOIN is the oracle
(backward direction, ties included: right.ts == left.ts matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest right ``value_cols``
    with right.ts ≤ left.ts for the same ``on`` key (NULLs where no
    right row precedes). Deterministic tiebreak: at equal ts the right
    row is visible to the left row (right sorts first); multiple right
    rows at the same (key, ts) resolve to the last in (ts, side) order
    — make right (key, ts) unique upstream for a total contract."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    extra_left = [c for c in left.columns if c not in (on, ts)]
    # left payload columns ride through the union (null on right rows),
    # right value columns likewise (null on left rows, filled by the
    # last-ignore-nulls carry)
    r_tagged = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in extra_left],
    )
    l_tagged = left.select(
        on,
        ts,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
        *extra_left,
    )
    unioned = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        on,
        ts,
        "_side",
        *extra_left,
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    on: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    left_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> str:
    """DuckDB twin via its native ASOF JOIN (backward, inclusive —
    the same semantics as the window construction above)."""
    value_sel = ", ".join(
        f"r.{c} AS {c}{suffix}" for c in (value_cols or [])
    )
    left_sel = ", ".join(f"l.{c}" for c in ([on, ts] + (left_cols or [])))
    return f"""
    WITH l AS ({left_sql}), r AS ({right_sql})
    SELECT {left_sel}, {value_sel}
    FROM l ASOF LEFT JOIN r ON l.{on} = r.{on} AND l.{ts} >= r.{ts}"""


def range_join_binned(
    points: DataFrame,
    ranges: DataFrame,
    v: str = "v",
    lo: str = "lo",
    hi: str = "hi",
    bin_width: float = 16.0,
) -> DataFrame:
    """Interval-containment join (point v ∈ [lo, hi]) without the
    O(|P|·|R|) broadcast-nested-loop a raw theta join plans: both
    sides bin by floor(x / bin_width) — points to their single bin,
    ranges exploded over the bins they span — then an EQUI-join on the
    bin plus the exact containment filter. Each qualifying (point,
    range) pair meets in exactly one bin (the point's), so no dedup
    stage is needed. Cost scales with Σ range-width/bin_width + |P|,
    shuffled on uniform integer bins; pick bin_width ≈ median range
    width so ranges explode to O(1) bins each."""
    pb = points.withColumn("_bin", F.floor(F.col(v) / bin_width))
    rb = ranges.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bin_width).cast("bigint"),
                F.floor(F.col(hi) / bin_width).cast("bigint"),
            )
        ),
    )
    return (
        pb.join(rb, "_bin")
        .filter((F.col(v) >= F.col(lo)) & (F.col(v) <= F.col(hi)))
        .drop("_bin")
    )
