"""The BSP wave-loop crawl engine — SURVEY.md §3.4.

One wave = one deterministic batch of Spark jobs:

  pending ──robots gate──▶ candidates ──salted rank≤budget──▶ scheduled
     │                                        │
     │ leftover (unscheduled)                 ▼ assign_global_seq (crawl order)
     │                                   sim-fetch join vs web
     │                                        │
     │             ┌─── retries (bypass dedup, next wave)
     │             ├─── redirect targets ─┐
     │             ├─── parsed links ─────┤──▶ canonicalize → offsite/depth
     │             │                      │    → first-parent dedup (in-wave)
     │             ├─── images → media dedup → corpus rows
     │             └─── fetch_log (+seq), lineage (per partition)
     ▼                                    ▼
  next pending = leftover ∪ retries ∪ (discoveries −Bloom/seen−)
  commit: frontier_pending, seen, bloom, fetch_log, corpus, lineage + manifest

Resume exactness: every wave's outputs land under wave-numbered dirs and the
manifest is advanced atomically afterwards (rcspark.tables). Killing the
driver between writes leaves uncommitted dirs that the next run overwrites —
re-running from the last manifest reproduces byte-identical state because
every operator in the wave is deterministic (data-only ordering keys; no
monotonically_increasing_id / current_timestamp anywhere).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from . import constants as C
from .dedup import bloom_update, empty_bloom, filter_unseen
from .fetch import classify_outcome, simulate_fetch
from .parse import parse_page
from .robots import apply_robots_gate, robots_table
from .schedule import assign_global_seq, rank_within_budget, with_budget
from .tables import (
    BLOOM_SCHEMA,
    CORPUS_SCHEMA,
    FETCH_LOG_SCHEMA,
    FRONTIER_SCHEMA,
    LINEAGE_SCHEMA,
    SEEN_SCHEMA,
    Warehouse,
)
from .urlnorm import canon_col


def _with_canon_cols(df: DataFrame, raw: str = "raw") -> DataFrame:
    """raw URL column → url_canon, digest, host, path (A2 + A3)."""
    return (
        df.withColumn("url_canon", canon_col(F.col(raw)))
        .filter(F.col("url_canon").isNotNull())
        .withColumn("digest", F.xxhash64("url_canon"))
        .withColumn(
            "host", F.substring_index(F.parse_url("url_canon", F.lit("HOST")), ":", 1)
        )
        .withColumn("path", F.parse_url("url_canon", F.lit("PATH")))
    )


def _observed_count(obs: Observation, fallback: DataFrame) -> int:
    """Read an observe() count metric; fall back to a count() job when the
    metric is missing. AQE's empty-relation propagation can collapse an
    all-empty plan and drop the CollectMetrics node (seen at the drain
    wave), leaving the Observation with a schemaless row — in exactly that
    case the fallback count is near-free."""
    try:
        return int(obs.get["n"])
    except Exception:
        return fallback.count()


@dataclass
class WaveStats:
    wave: int
    scheduled: int
    new_urls: int
    pending_next: int


class CrawlEngine:
    """Drives the wave loop over a Warehouse; resumes from the last commit."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        web: DataFrame,
        corpus_src: DataFrame,
        robots_pdf: pd.DataFrame,
        seeds_pdf: pd.DataFrame,
        allowed_hosts: list[str],
        transport=None,
        store_format: str | None = None,
    ):
        """``transport``: optional real-fetch binding (see
        fetch.PooledHttpTransport). None → the sandbox default, an
        equi-join against the `web` table (simulate_fetch). With a
        transport the wave fetch runs through fetch_http_arrow's
        per-host Arrow batches instead — same output contract, pinned
        equal end-to-end in tests/test_fetch_arrow.py.

        ``store_format``: optional A16 convert-on-store format for corpus
        images ('png' — multimodal.convert_images); None stores fetched
        bytes as-is. PNG is lossless, so decoded pixels are unchanged."""
        self.spark = spark
        self.wh = Warehouse(spark, root)
        self.web = web
        self.corpus_src = corpus_src
        self.robots = robots_table(spark, robots_pdf).persist()
        self.seeds_pdf = seeds_pdf
        self.allowed_hosts = list(allowed_hosts)
        self.transport = transport
        self.store_format = store_format

    # -- bootstrap ---------------------------------------------------------
    def _bootstrap(self) -> None:
        pdf = self.seeds_pdf.reset_index(drop=True)
        pdf["_seed_idx"] = pdf.index.astype("int64")
        seeds = self.spark.createDataFrame(pdf)
        fr = (
            _with_canon_cols(seeds.withColumnRenamed("url", "raw"))
            .filter(F.col("host").isin(self.allowed_hosts))
            .withColumn("priority", F.col("priority").cast("int"))
            .withColumn("depth", F.lit(0))
            .withColumn("discovered_wave", F.lit(0))
            .withColumn("retry_count", F.lit(0))
        )
        # in-file seed dedup: first occurrence wins (seed-list order is data)
        w = Window.partitionBy("url_canon").orderBy("_seed_idx")
        fr = fr.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        fr = fr.select([f.name for f in FRONTIER_SCHEMA.fields])
        self.wh.write_wave("frontier_pending", fr, 0)
        seen = fr.select(
            "digest", "url_canon", F.lit(0).alias("wave")
        )
        self.wh.write_wave("seen", seen, 0)
        bloom = bloom_update(fr.select("digest"), empty_bloom(self.spark))
        self.wh.write_wave("bloom", bloom, 0)
        self.wh.commit(0, {"seq_offset": 0})

    # -- one wave ----------------------------------------------------------
    def run_wave(self) -> WaveStats | None:
        """Process the next wave; None when the frontier is drained."""
        c_prev, meta = self.wh.last_committed()
        if c_prev < 0:
            self._bootstrap()
            c_prev, meta = self.wh.last_committed()
        t = c_prev  # oracle wave number being processed
        seq_offset = int(meta.get("seq_offset", 0))

        # drain check from the manifest (written with each commit) — saves a
        # Spark action per wave; fall back to counting for old manifests
        pending = self.wh.read_snapshot("frontier_pending", c_prev, FRONTIER_SCHEMA)
        n_pending_prev = meta.get("n_pending")
        if n_pending_prev is None:
            n_pending_prev = pending.limit(1).count()
        if n_pending_prev == 0:
            return None
        seen = self.wh.read_appends("seen", c_prev, SEEN_SCHEMA)
        bloom = self.wh.read_snapshot("bloom", c_prev, BLOOM_SCHEMA)
        corpus_so_far = self.wh.read_appends("corpus", c_prev, CORPUS_SCHEMA)

        # 1. robots gate (A7) — broadcast join, no shuffle of the frontier
        gated = apply_robots_gate(pending, self.robots)
        denied = gated.filter(~F.col("robots_allowed")).persist()
        cand = gated.filter(F.col("robots_allowed"))

        # 2-4. budgets + salted rank + global crawl-order seq (A5, A6)
        scheduled, leftover = rank_within_budget(with_budget(cand))
        gc_dfs: list[DataFrame] = []
        # (fetch_ms, host, j): j breaks the within-host ties that burst
        # mode (slot_group > 1) introduces — still a unique total order
        scheduled = assign_global_seq(
            scheduled, [F.col("fetch_ms"), F.col("host"), F.col("j")], seq_offset,
            persisted_out=gc_dfs,
        )

        # 5. fetch + outcome (A10-A12). No count() action here: n_scheduled
        # rides as an observe() metric on the fetch_log write (step 12) —
        # one of the three per-wave driver jobs VERDICT r1 #8 retired.
        if self.transport is not None:
            from .fetch import fetch_http_arrow

            fetched = fetch_http_arrow(scheduled, self.transport)
        else:
            fetched = simulate_fetch(scheduled, self.web)
        outcome = classify_outcome(fetched).persist()

        # 6. parse 200s (A14) — select narrow columns BEFORE the UDF so the
        # body column never rides through later stages (UDFs block pruning)
        parsed = (
            outcome.filter(F.col("result") == "fetched")
            .select("seq", "depth", "priority", parse_page(F.col("body")).alias("p"))
            .select("seq", "depth", "priority", "p.links", "p.image_url", "p.caption")
            .persist()
        )

        # 7. discoveries: links (depth+1, priority 0) ∪ redirect targets
        link_disc = parsed.select(
            F.col("seq").alias("parent_seq"),
            F.posexplode("links").alias("link_idx", "raw"),
            (F.col("depth") + 1).alias("depth"),
            F.lit(0).alias("priority"),
        ).select("parent_seq", "link_idx", "raw", "depth", "priority")
        redir_disc = (
            outcome.filter(F.col("result") == "redirect")
            .select(
                F.col("seq").alias("parent_seq"),
                F.lit(-1).alias("link_idx"),
                F.col("redirect_to").alias("raw"),
                F.col("depth"),
                F.col("priority"),
            )
        )
        disc = (
            _with_canon_cols(link_disc.unionByName(redir_disc))
            .filter(F.col("host").isin(self.allowed_hosts))      # A8 offsite
            .filter(F.col("depth") <= C.DEPTH_LIMIT)             # A9 depth
        )
        # first-parent rule: the earliest (parent_seq, link_idx) defines the
        # entry's depth/priority — matches the oracle's sequential first-add
        w_first = Window.partitionBy("url_canon").orderBy("parent_seq", "link_idx")
        disc = disc.withColumn("_rn", F.row_number().over(w_first)).filter(
            F.col("_rn") == 1
        )
        new_urls = (
            filter_unseen(disc, bloom, seen, persisted_out=gc_dfs)
            .select(
                "url_canon",
                "digest",
                "host",
                "path",
                "priority",
                "depth",
                F.lit(t + 1).alias("discovered_wave"),
                F.lit(0).alias("retry_count"),
            )
            .persist()
        )  # n_new comes from the seen write's observe() metric (step 12)

        # 8. retries (A11) — bypass the dupefilter
        retries = (
            outcome.filter(F.col("result") == "retry")
            .select(
                "url_canon",
                "digest",
                "host",
                "path",
                (F.col("priority") + C.RETRY_PRIORITY_ADJUST).alias("priority"),
                "depth",
                F.lit(t + 1).alias("discovered_wave"),
                (F.col("retry_count") + 1).alias("retry_count"),
            )
        )

        # 9. media (A16/A17): in-wave first-parent dedup + cross-wave anti-join
        imgs = (
            parsed.filter(F.col("image_url").isNotNull())
            .select(
                F.col("seq").alias("parent_seq"),
                canon_col(F.col("image_url")).alias("url_canon"),
                F.col("caption"),
            )
            .filter(F.col("url_canon").isNotNull())
        )
        w_img = Window.partitionBy("url_canon").orderBy("parent_seq")
        imgs = (
            imgs.withColumn("_rn", F.row_number().over(w_img))
            .filter(F.col("_rn") == 1)
            .join(corpus_so_far.select("url_canon"), "url_canon", "left_anti")
        )
        src = self.corpus_src.withColumnRenamed("caption", "_src_caption")
        new_corpus = imgs.join(
            src, imgs["url_canon"] == src["url"], "inner"
        ).select(
            "image_id",
            "bytes",
            "w",
            "h",
            "fmt",
            imgs["caption"],
            "phash",
            imgs["url_canon"],
            F.lit(t).alias("wave"),
        )
        if self.store_format is not None:
            from .datapipe.multimodal import convert_images

            new_corpus = convert_images(new_corpus, self.store_format)

        # 10. fetch_log (+ robots-denied rows, seq NULL)
        log = outcome.select(
            F.lit(t).alias("wave"),
            "seq",
            "url_canon",
            "digest",
            "host",
            F.col("status").cast("int"),
            "result",
            "fetch_ms",
            "priority",
            "depth",
            "retry_count",
        )
        denied_log = denied.select(
            F.lit(t).alias("wave"),
            F.lit(None).cast("long").alias("seq"),
            "url_canon",
            "digest",
            "host",
            F.lit(None).cast("int").alias("status"),
            F.lit(C.ST_ROBOTS_DENIED).alias("result"),
            F.lit(None).cast("long").alias("fetch_ms"),
            "priority",
            "depth",
            "retry_count",
        )

        # 11. per-partition lineage (A18, north-rule upgrade of global stats)
        def part_lineage(df: DataFrame) -> DataFrame:
            return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
                F.min("digest").alias("min_digest"),
                F.max("digest").alias("max_digest"),
                F.count("*").alias("scheduled"),
                F.sum((F.col("result") == "fetched").cast("long")).alias("fetched"),
                F.sum((F.col("result") == "retry").cast("long")).alias("retried"),
                F.lit(0).cast("long").alias("robots_denied"),
                F.sum((F.col("result") == "failed").cast("long")).alias("failed"),
            )

        lineage_parts = part_lineage(outcome).unionByName(
            denied.groupBy(F.spark_partition_id().alias("partition_id")).agg(
                F.min("digest").alias("min_digest"),
                F.max("digest").alias("max_digest"),
                F.lit(0).cast("long").alias("scheduled"),
                F.lit(0).cast("long").alias("fetched"),
                F.lit(0).cast("long").alias("retried"),
                F.count("*").alias("robots_denied"),
                F.lit(0).cast("long").alias("failed"),
            )
        )

        # 12. commit wave t as snapshot c = t+1. All SIX table writes are
        # submitted concurrently (Spark's scheduler accepts jobs from
        # multiple threads); the barrier before commit() keeps the snapshot
        # atomic. The wave's three bookkeeping counts (n_scheduled / n_new
        # / n_pending) ride as observe() metrics ON those write jobs
        # instead of separate count() actions (VERDICT r1 #8), and lineage
        # gets n_new as a broadcast one-row agg instead of a post-barrier
        # literal (VERDICT r3 #6) — zero serial writes remain.
        c = t + 1
        obs_sched = Observation()
        obs_new = Observation()
        obs_pending = Observation()
        next_pending = (
            leftover.select([f.name for f in FRONTIER_SCHEMA.fields])
            .unionByName(retries)
            .unionByName(new_urls.select([f.name for f in FRONTIER_SCHEMA.fields]))
            .observe(obs_pending, F.count(F.lit(1)).alias("n"))
        )
        seen_out = new_urls.select(
            "digest", "url_canon", F.lit(c).alias("wave")
        ).observe(obs_new, F.count(F.lit(1)).alias("n"))
        log_out = log.observe(obs_sched, F.count(F.lit(1)).alias("n")).unionByName(
            denied_log
        )
        # lineage joins the concurrent-write pool (VERDICT r3 item 6 — it
        # used to trail the barrier because it needed n_new as a literal):
        # the per-wave new_urls count rides in as a broadcast one-row agg
        # over the PERSISTED new_urls frame instead, so no write is serial.
        lineage = lineage_parts.crossJoin(
            F.broadcast(
                new_urls.agg(F.count(F.lit(1)).cast("long").alias("new_urls"))
            )
        ).select(
            F.lit(t).alias("wave"),
            "partition_id",
            "min_digest",
            "max_digest",
            "scheduled",
            "fetched",
            "retried",
            "robots_denied",
            "failed",
            "new_urls",
        )
        writes = [
            ("frontier_pending", next_pending),
            ("seen", seen_out),
            ("bloom", bloom_update(new_urls.select("digest"), bloom)),
            ("fetch_log", log_out),
            ("corpus", new_corpus),
            ("lineage", lineage),
        ]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            futures = [
                pool.submit(self.wh.write_wave, name, df, c) for name, df in writes
            ]
            for f in futures:
                f.result()  # re-raise any write failure before committing
        n_scheduled = _observed_count(obs_sched, outcome)
        n_new = _observed_count(obs_new, new_urls)
        n_pending = _observed_count(obs_pending, next_pending)
        # {**meta, ...}: carry forward manifest keys this wave doesn't own
        # (e.g. the compaction watermark — dropping it would silently point
        # readers back at per-wave dirs a gc() may have deleted)
        self.wh.commit(
            c, {**meta, "seq_offset": seq_offset + n_scheduled, "n_pending": n_pending}
        )
        for df in (denied, outcome, parsed, new_urls, *gc_dfs):
            df.unpersist()
        return WaveStats(t, n_scheduled, n_new, n_pending)

    def run(self, max_waves: int = 10_000) -> list[WaveStats]:
        stats = []
        for _ in range(max_waves):
            s = self.run_wave()
            if s is None:
                break
            stats.append(s)
        return stats

    # -- readers for tests/verification ------------------------------------
    def fetch_log(self) -> DataFrame:
        c, _ = self.wh.last_committed()
        return self.wh.read_appends("fetch_log", c, FETCH_LOG_SCHEMA)

    def seen_table(self) -> DataFrame:
        c, _ = self.wh.last_committed()
        return self.wh.read_appends("seen", c, SEEN_SCHEMA)

    def corpus_table(self) -> DataFrame:
        c, _ = self.wh.last_committed()
        return self.wh.read_appends("corpus", c, CORPUS_SCHEMA)

    def lineage_table(self) -> DataFrame:
        c, _ = self.wh.last_committed()
        return self.wh.read_appends("lineage", c, LINEAGE_SCHEMA)
