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


def fetch_http_arrow(
    scheduled: DataFrame,
    transport,
    pace: bool = False,
) -> DataFrame:
    """The real-cluster A10 fetcher: batched per-partition HTTP via
    ``mapInArrow``-style pandas batches.

    `scheduled` rows arrive already grouped by host and ordered by
    fetch_ms (rank_within_budget + assign_global_seq emit them that way),
    which is exactly the order a per-host HTTP client issues requests in.
    Each Arrow batch is fetched through `transport`, a callable
    ``url_canon -> (status:int|None, redirect_to:str|None, body:bytes|None)``
    — in production a pooled HTTP client (requests/aiohttp session per
    executor via closure), in tests/sandbox a dict-backed fake. The
    sandbox has no network, so the engine default stays `simulate_fetch`
    (equi-join vs the web table); this function is the drop-in the real
    cluster binds, with the same output contract.

    pace=True sleeps out each row's fetch_ms schedule inside the batch
    (real politeness); OFF for tests/benchmarks (simulated clock).
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(scheduled.schema.fields)
        + [
            T.StructField("status", T.IntegerType(), True),
            T.StructField("redirect_to", T.StringType(), True),
            T.StructField("body", T.BinaryType(), True),
        ]
    )

    def run(batches):
        import time as _t

        for pdf in batches:
            if pace and len(pdf) and "fetch_ms" in pdf:
                pdf = pdf.sort_values("fetch_ms").reset_index(drop=True)
            t0 = _t.monotonic()
            urls = pdf["url_canon"].tolist()
            fms = pdf["fetch_ms"].tolist() if pace and "fetch_ms" in pdf else None
            results = []
            for i, u in enumerate(urls):  # one iteration PER REQUEST (IO
                # dispatch, not a data transform — the data path stays
                # columnar; a production transport batches/pipelines here)
                if fms is not None:
                    delay = fms[i] / 1000.0 - (_t.monotonic() - t0)
                    if delay > 0:
                        _t.sleep(delay)
                results.append(transport(u))
            statuses = [r[0] for r in results]
            redirects = [r[1] for r in results]
            bodies = [r[2] for r in results]
            yield pdf.assign(status=pd.array(statuses, dtype="Int32"),
                             redirect_to=redirects, body=bodies)

    # partition by host so one task owns a host's whole schedule (slot
    # affinity — politeness pacing is then local to the task)
    by_host = scheduled.repartition("host")
    return by_host.mapInPandas(run, out_schema)


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
