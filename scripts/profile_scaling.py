"""Bisect the scaling pipeline: time each stage separately at a given core count."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rcspark.dedup import bloom_update, empty_bloom, filter_unseen
from rcspark.robots import apply_robots_gate
from rcspark.schedule import assign_global_seq, rank_within_budget, with_budget
from rcspark.session import get_spark
from rcspark.urlnorm import canon_col

N_URLS = 2_000_000
N_HOSTS = 1_000


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(cores: int) -> None:
    spark = get_spark(f"prof-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("xxhash64(cast(id as string)) h").agg({"h": "max"}).collect()

    ids = spark.range(N_URLS)
    hostnum = F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.pmod(F.col("id"), F.lit(N_HOSTS)))
    canon_twin = F.concat(
        F.lit("http://host"), hostnum.cast("string"), F.lit(".example.com/item/"),
        F.col("id").cast("string"), F.lit("?a="), (F.col("id") % 3).cast("string"),
        F.lit("&b="), (F.col("id") % 7).cast("string"),
    )
    raw = F.concat(
        F.lit("HTTP://Host"), hostnum.cast("string"), F.lit(".Example.COM:80/item/"),
        F.col("id").cast("string"), F.lit("?utm_source=bench&b="),
        (F.col("id") % 7).cast("string"), F.lit("&a="), (F.col("id") % 3).cast("string"),
        F.lit("#frag"),
    )
    times = {}

    t = time.time()
    frontier = (
        ids.select(F.col("id"), canon_col(raw).alias("url_canon"))
        .withColumn("digest", F.xxhash64("url_canon"))
        .withColumn("host", F.concat(F.lit("host"), hostnum.cast("string"), F.lit(".example.com")))
        .withColumn("path", F.concat(F.lit("/item/"), F.col("id").cast("string")))
        .withColumn("priority", (F.col("id") % 5).cast("long"))
        .withColumn("discovered_wave", F.lit(0))
        .withColumn("crawl_delay",
            F.when(hostnum % 4 == 0, F.lit(None).cast("double"))
            .when(hostnum % 4 == 1, F.lit(0.5))
            .when(hostnum % 4 == 2, F.lit(1.0))
            .otherwise(F.lit(2.0)))
    )
    noop(frontier)
    times["1_canon_digest"] = round(time.time() - t, 2)

    seen = (
        spark.range(0, N_URLS, 5).select(canon_twin.alias("url_canon"))
        .withColumn("digest", F.xxhash64("url_canon"))
    )
    t = time.time()
    bloom = bloom_update(seen.select("digest"), empty_bloom(spark))
    bloom.persist().count()
    times["2_bloom_build"] = round(time.time() - t, 2)

    t = time.time()
    fresh = filter_unseen(frontier, bloom, seen)
    noop(fresh)
    times["3_bloom_probe_anti"] = round(time.time() - t, 2)

    robots = (
        fresh.select("host").distinct()
        .select("host", F.array(F.lit("/item/13")).alias("allow_rules"),
                F.array(F.lit("/item/1"), F.lit("/item/3")).alias("deny_rules"),
                F.lit(None).cast("double").alias("crawl_delay"))
    )
    t = time.time()
    gated = apply_robots_gate(fresh.drop("crawl_delay"), robots).filter(F.col("robots_allowed"))
    noop(gated)
    times["4_robots_gate"] = round(time.time() - t, 2)

    t = time.time()
    scheduled, _ = rank_within_budget(with_budget(gated))
    noop(scheduled)
    times["5_schedule"] = round(time.time() - t, 2)

    t = time.time()
    ordered = assign_global_seq(scheduled, [F.col("fetch_ms"), F.col("host")], 0)
    noop(ordered)
    times["6_seq"] = round(time.time() - t, 2)

    print(json.dumps({"cores": cores, **times}))


if __name__ == "__main__":
    main(int(sys.argv[1]))
