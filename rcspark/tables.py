"""Iceberg-shaped table layer with a local snapshot/manifest fallback.

SURVEY.md A19 / §7.4: the north rule wants Iceberg tables with per-wave
snapshot checkpointing so a killed run resumes exactly. The sandbox has no
iceberg-spark-runtime jar, so this module provides the same commit contract
over plain parquet:

- each wave writes table data under ``<root>/<table>/wave=NNNNNN/`` via a
  write-to-temp + atomic ``os.rename`` (a stand-in for an Iceberg snapshot
  commit);
- a run is only advanced when ``commit(wave, meta)`` atomically replaces
  ``<root>/_manifest.json`` (stand-in for the Iceberg catalog pointer);
- resume reads the last committed manifest; any wave directories beyond it
  are uncommitted garbage from a killed run and are ignored/overwritten.

Tables come in two flavors:
- SNAPSHOT (``frontier_pending``, ``bloom``): each wave holds the full
  current state; read = latest committed wave only. (On real Iceberg this
  becomes copy-on-write MERGE.)
- APPEND (``seen``, ``fetch_log``, ``corpus``, ``lineage``): each wave adds
  rows; read = union of all committed waves. (On real Iceberg: appends.)

At 10^10-frontier scale the bindings change (Iceberg catalog + bucket(digest)
partition spec, see dedup.py/schedule.py docs) but this API surface does not.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SNAPSHOT_TABLES = {"frontier_pending", "bloom"}

# Tables laid out as bucket(digest, P) — the Iceberg partition-spec
# analogue in the parquet fallback: rows are hive-partitioned by
# shard = pmod(digest, P), one file per shard (clustered write). Iceberg
# binds the same spec with a true bucket transform; readers get
# shard-predicate partition pruning either way, and a digest-keyed
# operator (dedup anti-join, Bloom/cuckoo shard build) finds each key's
# rows in exactly one directory.
BUCKETED_TABLES = {"frontier_pending", "seen"}
N_SHARDS = 32  # == constants.BLOOM_SHARDS (kept literal: layout contract)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("digest", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovered_wave", T.IntegerType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("digest", T.LongType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("nbits", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
    ]
)

FETCH_LOG_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("digest", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("result", T.StringType(), False),
        T.StructField("fetch_ms", T.LongType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
    ]
)

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("min_digest", T.LongType(), True),
        T.StructField("max_digest", T.LongType(), True),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("retried", T.LongType(), False),
        T.StructField("robots_denied", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("new_urls", T.LongType(), False),
    ]
)


class Warehouse:
    """Per-wave snapshot/append storage with atomic manifest commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def last_committed(self) -> tuple[int, dict[str, Any]]:
        """(last committed wave, meta). (-1, {}) for a fresh warehouse."""
        if not os.path.exists(self._manifest_path):
            return -1, {}
        with open(self._manifest_path) as f:
            m = json.load(f)
        return m["wave"], m.get("meta", {})

    def commit(self, wave: int, meta: dict[str, Any]) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"wave": wave, "meta": meta}, f)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    # -- writes ------------------------------------------------------------
    def _wave_dir(self, table: str, wave: int) -> str:
        return os.path.join(self.root, table, f"wave={wave:06d}")

    def write_wave(self, table: str, df: DataFrame, wave: int) -> None:
        """Write one wave's data for `table` with an atomic dir rename.

        BUCKETED_TABLES are clustered by digest shard before writing
        (repartition by shard → partitionBy(shard) → one file per shard)."""
        from pyspark.sql import functions as F

        final = self._wave_dir(table, wave)
        tmp = final + ".inprogress"
        for p in (final, tmp):
            if os.path.exists(p):
                shutil.rmtree(p)  # garbage from a killed, uncommitted run
        if table in BUCKETED_TABLES and "digest" in df.columns:
            (
                df.withColumn("shard", F.pmod(F.col("digest"), F.lit(N_SHARDS)).cast("int"))
                .repartition(N_SHARDS, "shard")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(tmp)
            )
        else:
            df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)

    # -- compaction (Iceberg rewrite-data-files analogue) -------------------
    def compact(self, table: str, schema: T.StructType) -> None:
        """Rewrite an APPEND table's committed wave dirs into one
        consolidated dir and advance the manifest atomically.

        A long crawl accumulates one small parquet dir per wave per table
        (the small-files problem); Iceberg solves it with rewrite_data_files
        + a metadata swap, and this is the same two-step here: write the
        union to ``compact=NNNNNN`` (temp + rename), then commit a manifest
        whose ``compacted[table]`` watermark tells read_appends to take the
        consolidated dir instead of the per-wave dirs ≤ it. Readers before
        the commit still see the old dirs (which stay on disk — the atomic
        manifest swap is the only visibility switch), so a kill anywhere
        mid-compaction leaves a fully consistent warehouse.

        Idempotent: a re-run at an unchanged watermark is a no-op (it must
        be — the consolidated dir is the only copy of gc()'d waves, so it
        is never deleted before its replacement is fully written).
        """
        assert table not in SNAPSHOT_TABLES, "compact() is for APPEND tables"
        c, meta = self.last_committed()
        if c < 0:
            return
        if int(meta.get("compacted", {}).get(table, -1)) == c:
            return  # nothing appended since the last compaction: no-op
        df = self.read_appends(table, c, schema)
        final = os.path.join(self.root, table, f"compact={c:06d}")
        tmp = final + ".inprogress"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        # Write the replacement FIRST; any prior compact dir (a lower
        # watermark, or an uncommitted leftover at this name) stays intact
        # and readable until the new copy exists on disk.
        if table in BUCKETED_TABLES and "digest" in df.columns:
            from pyspark.sql import functions as F

            (
                df.withColumn(
                    "shard", F.pmod(F.col("digest"), F.lit(N_SHARDS)).cast("int")
                )
                .repartition(N_SHARDS, "shard")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(tmp)
            )
        else:
            df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):  # uncommitted leftover from a killed attempt
            old = final + ".superseded"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(final, old)
            os.rename(tmp, final)
            shutil.rmtree(old)
        else:
            os.rename(tmp, final)
        compacted = dict(meta.get("compacted", {}))
        compacted[table] = c
        self.commit(c, {**meta, "compacted": compacted})

    def gc(self, table: str) -> list[str]:
        """Delete dirs the committed manifest can no longer reference:
        per-wave dirs ≤ the table's compaction watermark and superseded
        compact dirs. Safe to run any time AFTER the compaction commit
        (the atomic manifest swap is the visibility barrier — nothing
        reads these dirs once the watermark is in). Returns removed paths.
        """
        _, meta = self.last_committed()
        cw = int(meta.get("compacted", {}).get(table, -1))
        if cw < 0:
            return []
        removed = []
        gone_waves = []
        tdir = os.path.join(self.root, table)
        for name in sorted(os.listdir(tdir)):
            path = os.path.join(tdir, name)
            m_wave = re.fullmatch(r"wave=(\d+)", name)
            m_comp = re.fullmatch(r"compact=(\d+)", name)
            if m_wave and int(m_wave.group(1)) <= cw:
                shutil.rmtree(path)
                removed.append(path)
                gone_waves.append(int(m_wave.group(1)))
            elif m_comp and int(m_comp.group(1)) != cw:
                shutil.rmtree(path)
                removed.append(path)
            elif name.startswith(("wave=", "compact=")) and not (m_wave or m_comp):
                # crash leftovers from compact()'s write-first swap
                # ('compact=NNNNNN.inprogress' / '.superseded'): never
                # referenced by any manifest, always-deletable garbage —
                # and int(...) on them must not wedge gc forever (ADVICE r3)
                shutil.rmtree(path)
                removed.append(path)
        if gone_waves:
            self._record_gc(table, gone_waves)
        return removed

    def _gc_log_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_gc.json")

    def _record_gc(self, table: str, waves: list[int]) -> None:
        """Tombstone the per-wave dirs gc() removed, so a later historical
        read (through_wave below the compaction watermark) can tell
        'this wave was never written' apart from 'this wave was deleted'."""
        path = self._gc_log_path(table)
        prior: list[int] = []
        if os.path.exists(path):
            with open(path) as f:
                prior = json.load(f).get("waves", [])
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"waves": sorted(set(prior) | set(waves))}, f)
        os.replace(tmp, path)

    def gc_tombstones(self, table: str) -> set[int]:
        path = self._gc_log_path(table)
        if not os.path.exists(path):
            return set()
        with open(path) as f:
            return set(json.load(f).get("waves", []))

    # -- reads -------------------------------------------------------------
    def _read_schema(self, table: str, schema: T.StructType) -> T.StructType:
        if table in BUCKETED_TABLES:
            return T.StructType(
                list(schema.fields) + [T.StructField("shard", T.IntegerType(), True)]
            )
        return schema

    def _read_dir(self, table: str, d: str, schema: T.StructType) -> DataFrame:
        if table in BUCKETED_TABLES:
            # basePath pins partition discovery to THIS wave dir so only the
            # shard= level is treated as a partition (wave=NNNNNN above it
            # would otherwise be discovered too and conflict across dirs)
            df = (
                self.spark.read.option("basePath", d)
                .schema(self._read_schema(table, schema))
                .parquet(d)
            )
            return df.drop("shard")
        return self.spark.read.schema(schema).parquet(d)

    def read_snapshot(self, table: str, wave: int, schema: T.StructType) -> DataFrame:
        """Latest-state table at `wave` (SNAPSHOT flavor)."""
        d = self._wave_dir(table, wave)
        if wave < 0 or not os.path.exists(d):
            return self.spark.createDataFrame([], schema)
        return self._read_dir(table, d, schema)

    def read_appends(self, table: str, through_wave: int, schema: T.StructType) -> DataFrame:
        """Union of all committed waves ≤ through_wave (APPEND flavor).
        If the manifest carries a compaction watermark for `table`, waves
        ≤ the watermark are read from the consolidated compact dir.

        Raises FileNotFoundError on a historical read (through_wave below
        the compaction watermark) that needs a per-wave dir gc() has
        deleted — the consolidated dir only serves reads AT the watermark,
        so such a read would otherwise silently return partial data."""
        _, meta = self.last_committed()
        cw = int(meta.get("compacted", {}).get(table, -1))
        dirs = []
        if cw >= 0 and cw <= through_wave:
            cd = os.path.join(self.root, table, f"compact={cw:06d}")
            if os.path.exists(cd):
                dirs.append(cd)
        else:
            if cw > through_wave:
                gone = self.gc_tombstones(table) & set(range(0, through_wave + 1))
                if gone:
                    raise FileNotFoundError(
                        f"read_appends({table!r}, through_wave={through_wave}) "
                        f"needs gc()'d wave dirs {sorted(gone)} (compaction "
                        f"watermark is {cw}); historical reads below the "
                        "watermark are only valid before gc()"
                    )
            cw = -1
        # a missing wave dir is fine (not every wave writes every table) —
        # unless gc() deleted it: then only the compact dir holds its rows,
        # and reaching this loop for that wave means the manifest lost the
        # compaction watermark (e.g. a commit that didn't carry meta
        # forward). Silently skipping would return partial data.
        needed = [
            w
            for w in range(cw + 1, through_wave + 1)
            if not os.path.exists(self._wave_dir(table, w))
        ]
        if needed:
            gone = self.gc_tombstones(table) & set(needed)
            if gone:
                raise FileNotFoundError(
                    f"read_appends({table!r}, through_wave={through_wave}) "
                    f"needs gc()'d wave dirs {sorted(gone)} but the manifest "
                    f"compaction watermark is {cw} — was the watermark "
                    "dropped by a commit that didn't carry meta forward?"
                )
        dirs += [
            self._wave_dir(table, w)
            for w in range(cw + 1, through_wave + 1)
            if os.path.exists(self._wave_dir(table, w))
        ]
        if not dirs:
            return self.spark.createDataFrame([], schema)
        if table in BUCKETED_TABLES:
            from functools import reduce

            return reduce(
                lambda a, b: a.unionByName(b),
                (self._read_dir(table, d, schema) for d in dirs),
            )
        return self.spark.read.schema(schema).parquet(*dirs)
