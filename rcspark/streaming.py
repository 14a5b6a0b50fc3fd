"""Structured Streaming operators — SURVEY.md §2 Table B 'streaming'.

The engine's primary mode is deterministic batch BSP waves (provable
crawl-order equality); this module is the continuous-mode counterpart:

- ``stream_available_now``: helper running a streaming DataFrame to
  completion with trigger(availableNow) into a memory sink and returning
  the result as a batch DataFrame (used by the driver-contract queries).
- ``stateful_politeness_schedule``: the custom stateful operator the
  reference's per-host downloader Slot becomes under streaming — a
  per-host GroupState counter assigns each arriving URL its fetch slot j
  and simulated fetch time (j-1)·delay(host), exactly the A5/A6 budget
  clock, via ``applyInPandasWithState`` (Arrow-batched, no per-row
  Python). State persists across micro-batches, so a long-running crawl
  stream keeps its politeness clock; with trigger(availableNow) over a
  static source the same code produces the deterministic batch answer the
  DuckDB oracle checks.

Watermarks/session windows are intentionally absent: the reference has no
event-time semantics (SURVEY.md Table B), so none are claimed.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .urlnorm import canon_col

SLOT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("j", T.LongType(), False),
        T.StructField("fetch_ms", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType(), False)])


def stream_available_now(stream_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Drain a streaming DataFrame with trigger(availableNow) into a memory
    sink; return the final result as a batch DataFrame."""
    sink = f"rcspark_stream_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def file_stream_dir(sf_dir: str, table: str) -> str:
    """FileStreamSource wants a directory; expose one parquet file through a
    symlink dir (stand-in for the per-wave append dirs a crawl tails)."""
    d = tempfile.mkdtemp(prefix=f"rcspark_stream_{table}_")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, f"{table}.parquet")),
        os.path.join(d, f"{table}.parquet"),
    )
    return d


def host_delay_ms_col(hostnum):
    """Per-host delay in ms — formula shared with the SQL oracle:
    (hostnum % 4 + 1) * 500."""
    return ((hostnum % 4 + 1) * 500).cast("long")


def politeness_slots(src: DataFrame) -> DataFrame:
    """The stateful transform: src(host, event_id, delay_ms, *extra) —
    streaming — → (host, event_id, j, fetch_ms, *extra) with per-host
    GroupState counters. Any columns beyond the required three ride
    through unchanged (url_canon/digest in the continuous pipeline).

    The whole micro-batch group is sorted by event_id (the deterministic
    pop order), numbered after the host's persisted count, and stamped
    with fetch_ms = (j-1)·delay(host); the count advances in GroupState so
    subsequent batches continue the clock (cross-batch continuity is
    pinned by tests/test_streaming.py).

    The per-group iterator is DRAINED AND CONCATENATED before sorting:
    Arrow chunk boundaries inside a micro-batch are arbitrary (one host's
    rows span chunks past maxRecordsPerBatch), so sorting each chunk
    independently would assign j/fetch_ms out of event_id order at
    production row counts while staying green at gate scale.
    """
    extra = [
        f for f in src.schema.fields if f.name not in ("host", "event_id", "delay_ms")
    ]
    out_schema = T.StructType(list(SLOT_SCHEMA.fields) + extra)
    extra_names = [f.name for f in extra]

    def assign_slots(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        (count,) = state.get if state.exists else (0,)
        frames = [p for p in pdfs if not p.empty]
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            pdf = pdf.sort_values("event_id").reset_index(drop=True)
            j = count + 1 + pdf.index.to_numpy()
            out = pd.DataFrame(
                {
                    "host": host,
                    "event_id": pdf["event_id"],
                    "j": j.astype("int64"),
                    "fetch_ms": ((j - 1) * pdf["delay_ms"].to_numpy()).astype("int64"),
                }
            )
            for name in extra_names:
                out[name] = pdf[name]
            yield out
            count += len(pdf)
        state.update((count,))

    return src.groupBy("host").applyInPandasWithState(
        assign_slots,
        out_schema,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def continuous_frontier_pipeline(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """The continuous-mode frontier: a streaming ingest of discovered URLs
    that canonicalizes, DEDUPLICATES ACROSS MICRO-BATCHES via the state
    store (streaming dropDuplicates on digest — the Scrapy RFPDupeFilter
    under structured streaming), assigns per-host politeness slots with
    GroupState counters, and appends to an exactly-once parquet sink.

    Run with trigger(availableNow) per invocation: each call drains
    whatever new files appeared in `in_dir` and RESUMES all state (seen
    digests, per-host slot clocks, processed-file log) from
    `checkpoint_dir` — kill/restart safety comes from the checkpoint, the
    streaming analogue of the warehouse manifest (A19).

    This is the ingest half of a continuous crawl; the fetch/parse loop
    feeding `in_dir` is the BSP wave engine (or any external discoverer).
    """
    src = (
        spark.readStream.schema("url string, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    canon = (
        src.select(canon_col(F.col("url")).alias("url_canon"), "seq")
        .filter(F.col("url_canon").isNotNull())
        .withColumn("digest", F.xxhash64("url_canon"))
        .withColumn(
            "host",
            F.substring_index(
                F.parse_url("url_canon", F.lit("HOST")), ":", 1
            ),
        )
    )
    deduped = canon.dropDuplicates(["digest"])  # state-store seen set
    slotted = deduped.select(
        "host",
        F.col("seq").alias("event_id"),
        F.lit(500).cast("long").alias("delay_ms"),
        "url_canon",
        "digest",
    )
    with_slots = politeness_slots(slotted)  # url_canon/digest ride through
    q = (
        with_slots.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-host slot assignment over an events-derived URL stream
    (driver-contract entry; single availableNow batch → deterministic,
    DuckDB-oracle-checkable)."""
    ev_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    src = (
        spark.readStream.schema(ev_schema)
        .parquet(file_stream_dir(sf_dir, "events"))
        .select("event_id", (F.col("user_id") % 20).alias("hostnum"))
        .select(
            F.concat(F.lit("h"), F.col("hostnum").cast("string"), F.lit(".example")).alias(
                "host"
            ),
            "event_id",
            host_delay_ms_col(F.col("hostnum")).alias("delay_ms"),
        )
    )
    return stream_available_now(politeness_slots(src), spark)
