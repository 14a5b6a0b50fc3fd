"""Exact distributed percentiles / ranks without single-partition sorts.

The scale problem this module kills (VERDICT r3 "What's wrong"): a
``row_number() OVER (ORDER BY v)`` — even partitioned by a low-cardinality
stratum — compiles to ``Exchange SinglePartition`` (or a handful of
partitions) + a full Sort of the table through ONE task. Correct at sf0.1,
dead at the north rule's 10^10-row frontier.

The scale-safe shape (same pattern as ``schedule.assign_global_seq`` and
``datapipe.text.stratified_cumsum``, which this builds on):

1. ``groupBy(stratum, value).count()`` — map-side combinable; the shuffle
   is linear in DISTINCT values per stratum, not rows.
2. A range-partitioned stratified running sum over those counts gives every
   distinct value its exact global rank span
   ``[cum_before + 1, cum_before + cnt]`` within its stratum. Only one
   subtotal row per (partition, stratum) ever reaches the driver.
3. Target ranks (p50/p90/q1/... derived from the per-stratum row count) are
   a tiny broadcast side; the value AT 1-based rank ``k`` is the unique
   span containing ``k`` — a broadcast join + filter, no shuffle.

Because a percentile is a property of the sorted VALUE multiset, the
rank-span pick is tie-break-free: whatever row-level tie-break a window
formulation used, the value at rank k is identical. Oracles therefore stay
byte-for-byte unchanged (they may keep their window form — DuckDB is the
referee, not the scaling target).

Reference semantics: SQL percentile_disc / percentile_cont
([U postgres ordered-set aggregates]); distributed shape is the classic
count-histogram + prefix-sum exact quantile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datapipe.text import stratified_cumsum


def value_rank_spans(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    npartitions: int = 32,
    persisted_out: list | None = None,
) -> DataFrame:
    """(stratum, value, cnt, cum_before): each distinct value's exact rank
    span within its stratum is [cum_before + 1, cum_before + cnt], ordered
    by value ascending. No window, no single-partition sort."""
    vc = df.groupBy(stratum_col, value_col).agg(F.count("*").alias("cnt"))
    return stratified_cumsum(
        vc,
        stratum_col,
        value_col,
        "cnt",
        "cum_before",
        npartitions=npartitions,
        persisted_out=persisted_out,
    )


def values_at_ranks(
    spans: DataFrame, targets: DataFrame, stratum_col: str
) -> DataFrame:
    """Pick the value at each 1-based target rank.

    ``targets`` is a SMALL dataframe (one row per wanted rank) with columns
    (stratum_col, k, ...carry columns); it is broadcast. Returns the spans'
    value column plus all target columns, one row per target rank that lies
    within the stratum (k > n yields no row — callers coalesce)."""
    j = spans.join(F.broadcast(targets), stratum_col)
    return j.filter(
        (F.col("cum_before") < F.col("k"))
        & (F.col("k") <= F.col("cum_before") + F.col("cnt"))
    ).drop("cnt", "cum_before")


def rank_targets(
    counts: DataFrame, stratum_col: str, rank_exprs: dict[str, str]
) -> DataFrame:
    """Explode a per-stratum row-count dataframe (stratum_col, n) into one
    row per wanted rank: (stratum_col, n, which, k). ``rank_exprs`` maps a
    label to an integer SQL expression over ``n`` (e.g. ``"(n + 1) div 2"``
    for the lower median)."""
    structs = [
        F.struct(F.lit(which).alias("which"), F.expr(expr).cast("long").alias("k"))
        for which, expr in rank_exprs.items()
    ]
    return counts.select(
        stratum_col, "n", F.explode(F.array(*structs)).alias("_t")
    ).select(stratum_col, "n", F.col("_t.which").alias("which"), F.col("_t.k").alias("k"))
