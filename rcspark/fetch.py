"""Fetch + outcome dispatch — SURVEY.md A10/A11/A12.

In the sandbox (no network) a "fetch" is an equi-join of the scheduled
frontier against the synthetic `web` table on url_canon — the same dataflow
shape as the real thing, where this join is replaced by a `mapInArrow` batch
HTTP fetcher per partition (the scheduled rows are already grouped by host
and ordered by fetch_ms, which is exactly the order a per-host HTTP client
would issue them in).

Outcome classification mirrors Scrapy's downloader middlewares:
- RETRY_STATUSES with retry_count < RETRY_TIMES → 'retry'
  (re-enqueued next wave at priority + RETRY_PRIORITY_ADJUST, bypassing the
  dupefilter — Scrapy RetryMiddleware semantics)
- REDIRECT_STATUSES → 'redirect' (target re-enters discovery A2→A4)
- 200 → 'fetched' (body goes to the parse UDF)
- anything else, or no such page (join miss) → 'failed'
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import REDIRECT_STATUSES, RETRY_STATUSES, RETRY_TIMES


def simulate_fetch(scheduled: DataFrame, web: DataFrame) -> DataFrame:
    """scheduled + (status, redirect_to, body) from the web table; join miss → NULL status."""
    w = web.select(
        F.col("url_canon").alias("_wu"),
        F.col("status").alias("status"),
        F.col("redirect_to"),
        F.col("body"),
    )
    return scheduled.join(w, scheduled["url_canon"] == w["_wu"], "left").drop("_wu")


def classify_outcome(fetched: DataFrame) -> DataFrame:
    """+ result string ∈ {fetched, retry, redirect, failed}."""
    retry_ok = F.col("retry_count") < F.lit(RETRY_TIMES)
    return fetched.withColumn(
        "result",
        F.when(F.col("status").isNull(), F.lit("failed"))
        .when(F.col("status").isin(*RETRY_STATUSES) & retry_ok, F.lit("retry"))
        .when(F.col("status").isin(*RETRY_STATUSES), F.lit("failed"))
        .when(F.col("status").isin(*REDIRECT_STATUSES), F.lit("redirect"))
        .when(F.col("status") == 200, F.lit("fetched"))
        .otherwise(F.lit("failed")),
    )
