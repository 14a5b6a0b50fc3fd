"""robots.txt gate — SURVEY.md A7 (Scrapy RobotsTxtMiddleware / protego).

Spark-first: instead of a per-row robots parser UDF, the (host, rule) lists
are *exploded into a small relational rules table* and the gate becomes a
broadcast join + aggregation — pure JVM-side expressions, no Python.

Matching semantics (shared with the oracle, rcspark.oracle):
- a rule matches iff the URL path starts with the rule prefix;
- the longest matching rule wins; on a length tie, Allow wins;
- no matching rule, or host absent from the robots table → allowed;
- `crawl_delay` feeds the politeness budget (rcspark.schedule). NOTE: the
  reference's Scrapy honors allow/deny but NOT Crawl-delay; honoring it is
  a north-rule extension (BASELINE.json "crawl-delay budgets") — flagged in
  tests/test_robots.py.

The robots table is tiny (one row per host) → Spark broadcasts it; the gate
adds no shuffle to the frontier.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("allow_rules", T.ArrayType(T.StringType()), False),
        T.StructField("deny_rules", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)


def robots_table(spark: SparkSession, robots_pdf: pd.DataFrame) -> DataFrame:
    """'Fetch + parse' of robots.txt, simulated from the fixture table.

    On a real cluster this is a grouped applyInPandas over the distinct new
    hosts doing the actual HTTP fetch + parse; the output contract is the
    same (host, allow_rules, deny_rules, crawl_delay).
    """
    pdf = robots_pdf.copy()
    # pandas represents a missing crawl_delay as NaN; Spark must see NULL
    pdf["crawl_delay"] = [
        None if pd.isna(v) else float(v) for v in pdf["crawl_delay"]
    ]
    return spark.createDataFrame(pdf, ROBOTS_SCHEMA)


def apply_robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """frontier(host, path, ...) → + boolean `robots_allowed`, double `crawl_delay`.

    Longest-prefix match computed relationally:
      best_len(kind) = max(length(rule)) over rules where path startswith rule
      allowed        = best_allow >= best_deny   (deny only wins when longer)
    """
    # longest matching prefix per kind, as a pure column expression over the
    # (broadcast) per-host rule arrays: filter rules by prefix-match, then max length.
    def best(rules_col):
        matched = F.filter(rules_col, lambda r: F.col("path").startswith(r))
        return F.coalesce(
            F.array_max(F.transform(matched, F.length)), F.lit(-1)
        )

    joined = frontier.join(F.broadcast(robots), on="host", how="left")
    return (
        joined.withColumn("_best_allow", best(F.coalesce(F.col("allow_rules"), F.array())))
        .withColumn("_best_deny", best(F.coalesce(F.col("deny_rules"), F.array())))
        .withColumn("robots_allowed", F.col("_best_allow") >= F.col("_best_deny"))
        .drop("allow_rules", "deny_rules", "_best_allow", "_best_deny")
    )


def robots_allowed_py(path: str, allow: list[str], deny: list[str]) -> bool:
    """Python twin for the oracle — identical longest-prefix semantics."""
    best_allow = max((len(r) for r in allow if path.startswith(r)), default=-1)
    best_deny = max((len(r) for r in deny if path.startswith(r)), default=-1)
    return best_allow >= best_deny
