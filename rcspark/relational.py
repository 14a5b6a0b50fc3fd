"""Relational operators Spark lacks as built-ins — composed from DataFrame
ops so Catalyst keeps optimizing them (SURVEY.md §2 Table B extensions;
round 3).

- ``asof_join``: the distributed merge-as-of (union + keyed window) — each
  probe row picks the latest quote at-or-before its timestamp. No range
  join, no per-row Python: ONE shuffle on the key plus a within-partition
  sort, the same shape pandas.merge_asof/KDB aj take single-node.
  [U flink temporal table join; pandas merge_asof]
- ``pagerank_hosts``: fixed-iteration PageRank in exact integer micro-units
  — the crawl-frontier host-authority prioritization signal (feeds A5
  priority). Integer arithmetic makes it bit-reproducible in DuckDB, so an
  iterative graph algorithm sits inside the hard correctness gate.
  [U scrapy frontier priority; classic PageRank]
- ``sitemap_entries``: sitemap-XML bodies → (loc, lastmod) rows via
  codegen regexp_extract_all + zip + posexplode — the A1 seed-injection
  front half for sites publishing sitemaps. [U scrapy SitemapSpider]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PAGERANK_SCALE = 1_000_000  # rank micro-units
PAGERANK_DAMPING_PCT = 85   # d = 0.85 as an integer percentage


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    key: str,
    probe_ts: str,
    quote_ts: str,
    value_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """For each probe row: the quote row with the greatest
    (quote_ts, tie_col) among quotes with the same `key` and
    quote_ts <= probe_ts (inclusive). Probe columns pass through; value
    columns arrive NULL when no quote qualifies.

    Shape: union probes+quotes, window partitionBy(key) orderBy
    (t, src, tie) with last(value, ignorenulls) over the unbounded-
    preceding frame — quotes sort before probes at an equal timestamp, so
    the inclusive <= falls out of the sort order, and ascending tie_col
    makes `last` pick the max-tie quote deterministically. One exchange on
    `key`; at 100 TB this is the plan you want (hash-partition both sides
    once, sort-merge within partitions — no O(probes·quotes) range
    explosion and no broadcast requirement on either side).
    """
    probe_cols = [c for c in probes.columns]
    q = quotes.select(
        F.col(key).alias("_k"),
        F.col(quote_ts).alias("_t"),
        F.lit(0).alias("_src"),
        F.col(tie_col).alias("_tie"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(quotes.schema[tie_col].dataType).alias("_tie"),
        *[F.lit(None).cast(quotes.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in probe_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_src").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Pick the winning quote ROW once (a struct is non-null whenever the
    # row is a quote, even if every value field is NULL), then project its
    # fields — merge_asof row-wise semantics. A per-column last(value,
    # ignorenulls) would let a NULL field fall back to an EARLIER quote
    # and stitch different value columns from different rows (ADVICE r3).
    qrow = F.when(
        F.col("_src") == 0, F.struct(*[F.col(c).alias(c) for c in value_cols])
    )
    win = F.last(qrow, ignorenulls=True).over(w).alias("_q")
    return (
        q.unionByName(p)
        .select("_k", "_src", *probe_cols, win)
        .filter(F.col("_src") == 1)
        .select(*probe_cols, *[F.col(f"_q.{c}").alias(c) for c in value_cols])
    )


def pagerank_hosts(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = PAGERANK_SCALE,
    damping_pct: int = PAGERANK_DAMPING_PCT,
) -> DataFrame:
    """(host, rank) after `iters` PageRank iterations over DISTINCT edges,
    every step in exact integer micro-units:

      contrib(v) = Σ_{(u,v)∈E} rank(u) div outdeg(u)
      rank'(v)   = ((100-d)·scale + d·contrib(v)) div 100

    Dangling mass leaks (the standard simplified formulation) — both
    engines mirror it, and for crawl prioritization only the relative
    order matters. Fixed iterations + integer div ⇒ the DuckDB oracle
    re-derives identical ranks CTE-by-CTE (sql_pagerank_ctes).

    Scale shape: ranks re-join edges on src each iteration — a hash join
    that AQE broadcasts while the host dim is small and shuffles once it
    is not; at web scale insert a localCheckpoint between iterations to
    cut lineage (iters is small and fixed, so the plan stays bounded).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = e.select(F.col("src").alias("host")).union(
        e.select(F.col("dst").alias("host"))
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("host", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("rank div od").alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "host"), "host", "left")
            .select(
                "host",
                F.expr(
                    f"CAST(({100 - damping_pct} * CAST({scale} AS BIGINT) + "
                    f"{damping_pct} * coalesce(contrib, CAST(0 AS BIGINT))) div 100 AS BIGINT)"
                ).alias("rank"),
            )
        )
    return ranks


def sql_pagerank_ctes(
    edges_sql: str,
    iters: int = 3,
    scale: int = PAGERANK_SCALE,
    damping_pct: int = PAGERANK_DAMPING_PCT,
) -> str:
    """DuckDB CTE chain re-deriving pagerank_hosts exactly; `edges_sql`
    must yield DISTINCT (src, dst). Final ranks in CTE `prF`(host, rank)."""
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1)",
        f"pr0 AS (SELECT host, CAST({scale} AS BIGINT) AS rank FROM nodes)",
    ]
    prev = "pr0"
    for t in range(1, iters + 1):
        ctes.append(
            f"""c{t} AS (
      SELECT e.dst AS host, sum(r.rank // o.od) AS contrib
      FROM edges e JOIN {prev} r ON r.host = e.src JOIN outdeg o ON o.src = e.src
      GROUP BY 1)"""
        )
        ctes.append(
            f"""pr{t} AS (
      SELECT n.host,
             CAST(({100 - damping_pct} * CAST({scale} AS BIGINT)
                   + {damping_pct} * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN c{t} c USING (host))"""
        )
        prev = f"pr{t}"
    ctes.append(f"prF AS (SELECT host, rank FROM {prev})")
    return ",\n    ".join(ctes)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    start_ts <= point_ts < end_ts (and equal `keys`, if given) — the range
    join Spark has no native optimized operator for.

    A naive theta-join is O(|points|·|intervals|) per key. Here each
    interval EXPLODES into the fixed time buckets it covers
    (ceil(len/bucket)+1 rows — bounded when interval length is), points
    map to one bucket, and the join runs on (keys…, bucket) as a plain
    hash equi-join followed by the exact range filter. Work scales with
    overlap density, not with the cross product; `bucket_seconds` tunes
    rows-per-interval against candidates-per-point (set it near the
    typical interval length). The same shape Flink uses for interval
    joins and DuckDB's IEJoin replaces single-node.

    Columns of both inputs pass through (same-name collisions are the
    caller's to alias, apart from the join keys).
    """
    keys = list(keys or [])

    def bucket_of(col: str) -> Column:
        # floor division; any constant session-tz offset cancels out — the
        # bucket join only PRUNES, the exact range filter decides membership
        return F.floor(F.unix_timestamp(F.col(col)) / F.lit(int(bucket_seconds))).cast(
            "long"
        )

    p_bucket = bucket_of(point_ts)
    i_lo = bucket_of(start_ts)
    i_hi = bucket_of(end_ts)
    p = points.withColumn("_bucket", p_bucket)
    i = intervals.withColumn("_bucket", F.explode(F.sequence(i_lo, i_hi)))
    joined = p.join(i, [*keys, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_bucket")


SITEMAP_LOC_RE = "<loc>([^<]*)</loc>"
SITEMAP_LASTMOD_RE = "<lastmod>([^<]*)</lastmod>"


def sitemap_entries(pages: DataFrame, body_col: str = "body") -> DataFrame:
    """pages(..., body: string) → one row per sitemap <url> entry:
    original columns + (seq, loc, lastmod). Pure codegen: two
    regexp_extract_all arrays zipped and posexploded — no Python, no UDF.
    Assumes well-formed entries carry both tags (a count mismatch zips to
    NULL-padded rows rather than silently dropping — arrays_zip pads)."""
    keep = [c for c in pages.columns if c != body_col]
    locs = F.regexp_extract_all(F.col(body_col), F.lit(SITEMAP_LOC_RE), 1)
    mods = F.regexp_extract_all(F.col(body_col), F.lit(SITEMAP_LASTMOD_RE), 1)
    return (
        pages.select(*keep, F.posexplode(F.arrays_zip(locs, mods)).alias("_i", "_e"))
        .select(
            *keep,
            (F.col("_i") + 1).cast("long").alias("seq"),
            F.col("_e").getField("0").alias("loc"),
            F.col("_e").getField("1").alias("lastmod"),
        )
    )


def sitemap_image_entries(pages: DataFrame, body_col: str = "body") -> DataFrame:
    """pages(..., body: string) → one row per image entry of the Google
    image-sitemap extension: original columns + (page_loc, img_seq,
    img_loc, caption).

    [U sitemaps.org protocol + Google image sitemap extension
    (<image:image> with <image:loc>/<image:caption> nested under <url>)]

    Two-level pure-codegen parse, no UDF:
      1. split the body into <url> blocks (regexp_extract_all + posexplode);
      2. per block — in its OWN select, so the extracted attributes feed
         the next Generate instead of re-evaluating per exploded row (the
         batch-30 plan lesson) — extract the page <loc>, the
         <image:loc> array and the <image:caption> array, then zip +
         posexplode.
    Captions are XML-unescaped (&lt; &gt; &quot; &apos; first, &amp;
    LAST — the standard order, so '&amp;lt;' decodes to '&lt;')."""
    keep = [c for c in pages.columns if c != body_col]
    blocks = F.regexp_extract_all(
        F.col(body_col), F.lit("<url>(.*?)</url>"), 1
    )
    per_block = pages.select(
        *keep, F.posexplode(blocks).alias("_bi", "_block")
    ).select(
        *keep,
        F.regexp_extract(F.col("_block"), "<loc>([^<]*)</loc>", 1).alias(
            "page_loc"
        ),
        F.regexp_extract_all(
            F.col("_block"), F.lit("<image:loc>([^<]*)</image:loc>"), 1
        ).alias("_ilocs"),
        F.regexp_extract_all(
            F.col("_block"),
            F.lit("<image:caption>([^<]*)</image:caption>"),
            1,
        ).alias("_caps"),
    )
    cap = F.col("_e").getField("_caps")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&amp;", "&"),  # LAST
    ):
        cap = F.replace(cap, F.lit(ent), F.lit(ch))
    return per_block.select(
        *keep,
        "page_loc",
        F.posexplode(F.arrays_zip("_ilocs", "_caps")).alias("_i", "_e"),
    ).select(
        *keep,
        "page_loc",
        (F.col("_i") + 1).cast("long").alias("img_seq"),
        F.col("_e").getField("_ilocs").alias("img_loc"),
        cap.alias("caption"),
    )


# -- Connected components (dedup-cluster resolution) ---------------------------

CC_ITERS = 4  # label-propagation rounds (near-dup clusters are cliquish)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = CC_ITERS,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    persisted_out: list | None = None,
) -> DataFrame:
    """(node, cluster) after `iters` rounds of min-label propagation over
    the UNDIRECTED edge set: label'(v) = min(label(v), min label(u) over
    neighbors u), label0(v) = v. Nodes absent from edges keep their own
    id (singleton clusters). Fixed iteration count ⇒ deterministic output
    even before convergence, so the DuckDB oracle (sql_cc_ctes) re-derives
    identical labels CTE-by-CTE; convergence itself is pinned by pytest
    (iters vs iters+1 equality).

    Scale shape: each round is one groupBy(min) over the symmetrized edge
    list plus a node-keyed left join — both shuffle on node id, and AQE
    broadcasts the label frame while the frontier of non-singleton nodes
    is small. Near-dup clusters are dense (a dup family is near-cliquish),
    so the graph diameter — the number of rounds needed — stays tiny at
    corpus scale; for adversarial long-chain graphs the production upgrade
    is alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce"), same per-round join shape. At
    web scale insert a localCheckpoint between rounds to cut lineage.
    [U GraphFrames connectedComponents; Kiveris et al. 2014]
    """
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    # fan-out points: `und` is probed every round and `lab` is referenced
    # twice per round (neighbor side + carry side) — without persist the
    # edge lineage re-evaluates per round and the label plan doubles per
    # round. Caller releases via persisted_out (or catalog.clearCache).
    und = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct().persist()
    if persisted_out is not None:
        persisted_out.append(und)
    lab = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("cluster")
    )
    for _ in range(iters):
        nbr_min = (
            und.join(lab.withColumnRenamed("node", "d").withColumnRenamed("cluster", "_nl"), "d")
            .groupBy("s")
            .agg(F.min("_nl").alias("_m"))
            .withColumnRenamed("s", "node")
        )
        lab = lab.join(nbr_min, "node", "left").select(
            "node", F.least(F.col("cluster"), F.coalesce("_m", "cluster")).alias("cluster")
        ).persist()
        if persisted_out is not None:
            persisted_out.append(lab)
    return lab


def sql_cc_ctes(nodes_sql: str, edges_sql: str, iters: int = CC_ITERS) -> str:
    """DuckDB CTE chain re-deriving connected_components exactly:
    `nodes_sql` yields (node), `edges_sql` yields (src, dst); final labels
    in CTE `ccF`(node, cluster)."""
    ctes = [
        f"ccnodes AS ({nodes_sql})",
        f"ccedges0 AS ({edges_sql})",
        """ccund AS (
      SELECT src AS s, dst AS d FROM ccedges0
      UNION SELECT dst, src FROM ccedges0)""",
        "cc0 AS (SELECT node, node AS cluster FROM ccnodes)",
    ]
    prev = "cc0"
    for t in range(1, iters + 1):
        ctes.append(f"""ccm{t} AS (
      SELECT e.s AS node, min(l.cluster) AS m
      FROM ccund e JOIN {prev} l ON l.node = e.d GROUP BY 1)""")
        ctes.append(f"""cc{t} AS (
      SELECT l.node, least(l.cluster, coalesce(m.m, l.cluster)) AS cluster
      FROM {prev} l LEFT JOIN ccm{t} m USING (node))""")
        prev = f"cc{t}"
    ctes.append(f"ccF AS (SELECT node, cluster FROM {prev})")
    return ",\n    ".join(ctes)


ANCHOR_HREF_RE = '<a href="([^"]*)">'
ANCHOR_TEXT_RE = '">([^<]*)</a>'


def anchor_pairs(pages: DataFrame, body_col: str = "body") -> DataFrame:
    """pages(..., body) → one row per `<a href="U">T</a>` anchor: original
    columns + (seq, href, anchor). Same codegen shape as sitemap_entries
    (two regexp_extract_all arrays zipped + posexploded); the back half of
    A14 that feeds an anchor-text index. [U scrapy/linkextractors]"""
    keep = [c for c in pages.columns if c != body_col]
    hrefs = F.regexp_extract_all(F.col(body_col), F.lit(ANCHOR_HREF_RE), 1)
    texts = F.regexp_extract_all(F.col(body_col), F.lit(ANCHOR_TEXT_RE), 1)
    return (
        pages.select(*keep, F.posexplode(F.arrays_zip(hrefs, texts)).alias("_i", "_e"))
        .select(
            *keep,
            (F.col("_i") + 1).cast("long").alias("seq"),
            F.col("_e").getField("0").alias("href"),
            F.col("_e").getField("1").alias("anchor"),
        )
    )


def hits_hosts(
    edges: DataFrame, iters: int = 3, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(host, hub, auth) after `iters` HITS iterations over DISTINCT edges,
    unnormalized in exact int64:

      auth'(v) = Σ_{(u,v)∈E} hub(u)        hub'(u) = Σ_{(u,v)∈E} auth'(v)

    starting from hub = 1.  Normalization is deliberately dropped (it needs
    sqrt; cross-engine libm equality is not a contract — same reasoning as
    the rational-idf BM25): with fixed small `iters` the magnitudes stay
    well inside int64 and the ORDER — all a frontier prioritizer consumes —
    matches normalized HITS exactly.  Scale shape = PageRank's: each
    half-step is one edges⋈scores hash join + groupBy, AQE broadcasts the
    score side while the host dim is small.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = e.select(F.col("src").alias("host")).union(
        e.select(F.col("dst").alias("host"))
    ).distinct()
    hub = nodes.withColumn("hub", F.lit(1).cast("long"))
    auth = None
    for _ in range(iters):
        auth = (
            e.join(hub.withColumnRenamed("host", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .withColumnRenamed("dst", "host")
        )
        hub = (
            e.join(auth.withColumnRenamed("host", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed("src", "host")
        )
    out = (
        nodes.join(hub, "host", "left")
        .join(auth, "host", "left")
        .select(
            "host",
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
        )
    )
    return out


def sql_hits_ctes(edges_sql: str, iters: int = 3) -> str:
    """DuckDB CTE chain re-deriving hits_hosts exactly; final CTE
    `hitsF`(host, hub, auth)."""
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges)",
        "h0 AS (SELECT host, CAST(1 AS BIGINT) AS hub FROM nodes)",
    ]
    prev_h = "h0"
    prev_a = None
    for t in range(1, iters + 1):
        ctes.append(
            f"""a{t} AS (
      SELECT e.dst AS host, sum(h.hub) AS auth
      FROM edges e JOIN {prev_h} h ON h.host = e.src GROUP BY 1)"""
        )
        ctes.append(
            f"""h{t} AS (
      SELECT e.src AS host, sum(a.auth) AS hub
      FROM edges e JOIN a{t} a ON a.host = e.dst GROUP BY 1)"""
        )
        prev_h, prev_a = f"h{t}", f"a{t}"
    ctes.append(
        f"""hitsF AS (
      SELECT n.host, CAST(COALESCE(h.hub, 0) AS BIGINT) AS hub,
             CAST(COALESCE(a.auth, 0) AS BIGINT) AS auth
      FROM nodes n LEFT JOIN {prev_h} h USING (host)
      LEFT JOIN {prev_a} a USING (host))"""
    )
    return ",\n    ".join(ctes)
