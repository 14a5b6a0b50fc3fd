"""Engine-level crawl benchmark: the FULL CrawlEngine (wave loop, snapshot
commits, lineage, resume machinery — not just the dataflow) over a larger
synthetic web. Complements bench.py's single-wave pipeline number with the
end-to-end waves/sec + URLs/sec the whole engine sustains, warehouse IO
included.

Usage: python scripts/bench_crawl.py [n_hosts] [urls_per_host] [cores]
                                     [max_waves] [image_fraction]
Writes BENCH/CRAWL.md (default sizing) or appends a scale-rehearsal
section (non-default sizing, VERDICT r4 item 8) and prints one JSON line
including per-wave wall-clock timings.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    urls_per_host = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    max_waves = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000
    image_fraction = float(sys.argv[5]) if len(sys.argv) > 5 else 0.3
    n_seeds = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    default_sizing = (n_hosts, urls_per_host, max_waves, n_seeds) == (
        12, 800, 10_000, 3,
    )

    from pyspark.sql import functions as F

    from bench import cpu_capacity
    from rcspark.fixtures import make_fixture
    from rcspark.run import CrawlEngine
    from rcspark.session import get_spark

    capacity = cpu_capacity()
    spark = get_spark("bench-crawl", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    fx = make_fixture(
        n_hosts=n_hosts, urls_per_host=urls_per_host,
        image_fraction=image_fraction, seed=7, n_seeds=n_seeds,
    )
    gen_s = time.time() - t0
    n_universe = len(fx.web)

    root = tempfile.mkdtemp(prefix="rcspark_bench_crawl_")
    web = spark.createDataFrame(fx.web).persist()
    corpus_src = spark.createDataFrame(fx.corpus) if len(fx.corpus) else None
    web.count()
    try:
        eng = CrawlEngine(
            spark,
            root,
            web,
            corpus_src,
            fx.robots,
            fx.seeds,
            fx.allowed_hosts,
        )
        t1 = time.time()
        # run_wave loop instead of eng.run() so each wave is individually
        # timed — the per-wave driver-overhead amortization evidence
        # (VERDICT r4 item 8)
        stats, wave_walls = [], []
        for _ in range(max_waves):
            tw = time.time()
            s = eng.run_wave()
            if s is None:
                break
            wave_walls.append(round(time.time() - tw, 2))
            stats.append(s)
        crawl_s = time.time() - t1
        fetch_log = eng.fetch_log()
        n_attempts = fetch_log.filter(F.col("seq").isNotNull()).count()
        n_seen = eng.seen_table().count()
        n_images = eng.corpus_table().count()
        out = {
            "metric": "full CrawlEngine crawl (waves+snapshots+lineage)",
            "value": round(crawl_s, 2),
            "unit": "sec",
            "cores": cores,
            "web_universe_urls": n_universe,
            "waves": len(stats),
            "fetch_attempts": n_attempts,
            "seen_urls": n_seen,
            "images": n_images,
            "fetch_attempts_per_sec": round(n_attempts / crawl_s, 1),
            "waves_per_sec": round(len(stats) / crawl_s, 2),
            "per_wave_wall_s": wave_walls,
            "per_wave_scheduled": [s.scheduled for s in stats],
            "fixture_gen_s": round(gen_s, 2),
            "note": "fetch rate is politeness-budget-bound by design "
            "(per-host crawl-delay budgets cap scheduling per wave); "
            "dataflow throughput is bench.py / scripts/scaling.py",
            **capacity,
        }
        print(json.dumps(out))
        os.makedirs("BENCH", exist_ok=True)
        if not default_sizing:
            # scale rehearsal: APPEND a section, keep the headline intact
            wave_rows = "\n".join(
                f"| {i} | {w}s | {s.scheduled:,} | {s.new_urls:,} |"
                for i, (w, s) in enumerate(zip(wave_walls, stats))
            )
            with open("BENCH/CRAWL.md", "a") as f:
                f.write(
                    f"""

## Scale rehearsal — {n_universe:,}-URL web ({n_hosts} hosts), cores={cores}

```
{json.dumps(out, indent=2)}
```

| wave | wall | scheduled | new URLs |
| --- | --- | --- | --- |
{wave_rows}

Per-URL engine cost here: {crawl_s / max(n_attempts, 1) * 1000:.1f} ms per
fetch attempt over {len(stats)} waves ({crawl_s / max(len(stats), 1):.1f}s
per wave including snapshot commits) — read against the headline run's
per-URL cost at comparable `cpu_matmuls_per_s_*` stamps.

Reproduce: `python scripts/bench_crawl.py {n_hosts} {urls_per_host} {cores} {max_waves} {image_fraction} {n_seeds}`
"""
                )
            return
        with open("BENCH/CRAWL.md", "w") as f:
            f.write(
                f"""# Engine-level crawl benchmark (full wave loop)

Full `CrawlEngine.run()` — robots gate, budgets, salted scheduling, global
seq, sim-fetch, parse, discovery dedup (broadcast Bloom + anti-join),
media pipeline, per-partition lineage, and a snapshot COMMIT (parquet
write + manifest rename) every wave — over a {n_universe:,}-URL synthetic
web ({n_hosts} hosts, Zipf-skewed).

```
{json.dumps(out, indent=2)}
```

Interpretation: the engine drains the reachable frontier in {len(stats)}
waves ({crawl_s / max(len(stats), 1):.1f}s/wave including every snapshot
commit). The fetch-attempt rate is POLITENESS-BOUND by design — per-host
crawl-delay budgets cap how much any wave may schedule (the same reason
the reference crawls slowly: it is being polite, not slow). Engine
dataflow throughput — what a 1000-executor cluster would scale — is the
bench.py wave-pipeline and scripts/scaling.py numbers (tens of thousands
of URLs/sec/core through canon+dedup+gate+rank+seq). Per-wave wall-clock
here is dominated by fixed per-job overhead at toy data sizes; it
amortizes at production wave sizes. CPU-capacity fields record the host's
real parallel supply at measurement time (it varies >5x —
BENCH/SCALING.md).

Reproduce: `python scripts/bench_crawl.py {n_hosts} {urls_per_host} {cores}`
"""
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
