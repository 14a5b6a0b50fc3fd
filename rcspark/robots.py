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


# Longest-match length of one rule against `path`, as a SQL lambda body.
# Two tiers (protego dialect):
#  - plain prefix rule (no '*', no trailing '$'): startswith — stays in
#    whole-stage codegen, the hot path for real robots files;
#  - wildcard rule: '*' → '.*', trailing '$' anchors; matched via a
#    non-foldable RLike (compiled per evaluation — acceptable because
#    wildcard rules are rare and the rule arrays are tiny).
# Match priority = length of the ORIGINAL rule (protego semantics).
_RULE_MATCH_SQL = """
  CASE WHEN instr({r}, '*') = 0 AND NOT endswith({r}, '$') THEN
         CASE WHEN startswith(path, {r}) THEN length({r}) END
       ELSE
         CASE WHEN path rlike concat(
                '^',
                replace(
                  regexp_replace(
                    CASE WHEN endswith({r}, '$')
                         THEN substring({r}, 1, length({r}) - 1) ELSE {r} END,
                    '([.^$+?(){{}}\\\\[\\\\]|\\\\\\\\])', '\\\\\\\\$1'),
                  '*', '.*'),
                CASE WHEN endswith({r}, '$') THEN '$' ELSE '' END)
              THEN length({r}) END
  END"""


def _best_expr(rules_col_name: str):
    body = _RULE_MATCH_SQL.format(r="r")
    return F.expr(
        f"coalesce(array_max(transform(coalesce({rules_col_name}, array()),"
        f" r -> {body})), -1)"
    )


def apply_robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """frontier(host, path, ...) → + boolean `robots_allowed`, double `crawl_delay`.

    Longest-match computed relationally over the (broadcast) per-host rule
    arrays: best_len(kind) = max(match length) over matching rules;
    allowed = best_allow >= best_deny (deny only wins when strictly longer).
    Supports the protego wildcard dialect — see _RULE_MATCH_SQL.
    """
    joined = frontier.join(F.broadcast(robots), on="host", how="left")
    return (
        joined.withColumn("_best_allow", _best_expr("allow_rules"))
        .withColumn("_best_deny", _best_expr("deny_rules"))
        .withColumn("robots_allowed", F.col("_best_allow") >= F.col("_best_deny"))
        .drop("allow_rules", "deny_rules", "_best_allow", "_best_deny")
    )


def _match_len_py(path: str, rule: str) -> int | None:
    """Python twin of _RULE_MATCH_SQL (prefix fast path + wildcard regex)."""
    import re as _re

    if "*" not in rule and not rule.endswith("$"):
        return len(rule) if path.startswith(rule) else None
    body = rule[:-1] if rule.endswith("$") else rule
    rx = "^" + _re.escape(body).replace("\\*", ".*") + (
        "$" if rule.endswith("$") else ""
    )
    return len(rule) if _re.search(rx, path) else None


def robots_allowed_py(path: str, allow: list[str], deny: list[str]) -> bool:
    """Python twin for the oracle — identical longest-match semantics."""
    best_allow = max(
        (m for r in allow if (m := _match_len_py(path, r)) is not None), default=-1
    )
    best_deny = max(
        (m for r in deny if (m := _match_len_py(path, r)) is not None), default=-1
    )
    return best_allow >= best_deny


# ---------------------------------------------------------------------------
# robots.txt TEXT parsing — the real-cluster A7 front half. The reference
# delegates to protego via RobotsTxtMiddleware; the subset implemented here
# is the part its crawl semantics use: User-agent grouping with '*'
# fallback, Allow/Disallow prefix rules, Crawl-delay. (No wildcards/$ —
# the classic prefix dialect Scrapy's default matcher honors.)
# ---------------------------------------------------------------------------

def parse_robots_txt(text: str, agent: str = "*") -> dict:
    """robots.txt body → {allow_rules, deny_rules, crawl_delay}.

    Group selection: rules from every group whose User-agent matches
    `agent` exactly or is '*'; a specific-agent group (exact name) takes
    precedence over the wildcard groups when present.
    """
    groups: list[tuple[list[str], dict]] = []  # (agents, rules)
    cur_agents: list[str] = []
    cur: dict | None = None
    # a UTF-8 BOM glues onto the first directive's key ("﻿user-agent")
    # and would silently drop that whole group — strip it up front
    for raw in text.lstrip("\ufeff").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue  # blank / comment / truncated directive ("Disallow")
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if cur is not None and cur["_open"]:
                cur_agents.append(val.lower())
            else:
                cur = {"allow": [], "deny": [], "delay": None, "_open": True}
                cur_agents = [val.lower()]
                groups.append((cur_agents, cur))
        elif cur is not None and key in ("allow", "disallow", "crawl-delay"):
            # only KNOWN rule lines end a group's user-agent accumulation;
            # unknown directives (sitemap, host, garbage keys, bare colons)
            # are ignored entirely per RFC 9309 — they must neither split a
            # "User-agent: a / unknown / User-agent: b" run into two groups
            # nor drop rules that follow them
            cur["_open"] = False
            if key == "allow" and val:
                cur["allow"].append(val)
            elif key == "disallow":
                if val:  # empty Disallow = allow all (no rule)
                    cur["deny"].append(val)
            else:  # crawl-delay
                try:
                    cur["delay"] = float(val)
                except ValueError:
                    pass  # malformed delay value: directive ignored

    agent = agent.lower()
    exact = [g for agents, g in groups if agent in agents]
    wild = [g for agents, g in groups if "*" in agents]
    chosen = exact if exact else wild
    allow: list[str] = []
    deny: list[str] = []
    delay = None
    for g in chosen:
        allow.extend(g["allow"])
        deny.extend(g["deny"])
        if g["delay"] is not None:
            delay = g["delay"] if delay is None else max(delay, g["delay"])
    matched = "exact" if exact else ("wildcard" if wild else "none")
    return {
        "allow_rules": allow,
        "deny_rules": deny,
        "crawl_delay": delay,
        "matched": matched,
    }


def robots_from_bodies(bodies: DataFrame) -> DataFrame:
    """(host, body binary) → robots table, parsed per host group.

    The real-cluster A7 shape: distinct new hosts are fetched (mapInArrow
    HTTP in production; the fixture/web table here) and their robots.txt
    bytes parsed in one Arrow-batched pass — rules become DATA for the
    broadcast-join gate, never a per-frontier-row parser call.
    """
    import pandas as pd

    def parse(batch_iter):
        for pdf in batch_iter:
            out = []
            for host, body in zip(pdf["host"], pdf["body"]):
                text = bytes(body).decode("utf-8", "replace") if body is not None else ""
                r = parse_robots_txt(text)
                out.append((host, r["allow_rules"], r["deny_rules"], r["crawl_delay"]))
            yield pd.DataFrame(
                out, columns=["host", "allow_rules", "deny_rules", "crawl_delay"]
            )

    return bodies.select("host", "body").mapInPandas(parse, ROBOTS_SCHEMA)


# -- per-agent opt-out matrix (AI-crawler compliance audit) --------------------
# A training-data crawl must honor AGENT-SPECIFIC robots groups, not just
# '*': publishers opt out of AI training by naming GPTBot / CCBot /
# ClaudeBot / Google-Extended in their own group (RFC 9309 group selection:
# an exact-name group REPLACES the wildcard group entirely — it does not
# merge with it). This helper parses each host's robots.txt once per agent
# and emits the verdict matrix the curation plane joins against.

AI_AGENTS = ("gptbot", "ccbot", "claudebot", "google-extended")

AGENT_MATRIX_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("agent", T.StringType(), False),
        T.StructField("matched_group", T.StringType(), False),
        T.StructField("opt_out", T.BooleanType(), False),
        T.StructField("probe_allowed", T.BooleanType(), False),
        T.StructField("crawl_delay_ms", T.LongType(), True),
    ]
)


def robots_agent_matrix(
    bodies: DataFrame,
    agents: tuple[str, ...] = AI_AGENTS,
    probe_path: str = "/images/i1.jpg",
) -> DataFrame:
    """(host, body string) → one verdict row per (host, agent).

    opt_out = the site root '/' is denied for that agent (the full
    training-opt-out form); probe_allowed = `probe_path` survives the
    longest-match rules; crawl_delay_ms = the group's Crawl-delay in
    integer milliseconds (NULL when unset — and NULL when an exact group
    exists without one, per RFC 9309 group replacement).

    Arrow-batched mapInPandas: one parse per (host, agent), linear in
    hosts, zero shuffles — the matrix is broadcast-sized downstream
    (#hosts × len(agents)).
    """

    def emit(batch_iter):
        for pdf in batch_iter:
            out = []
            for host, body in zip(pdf["host"], pdf["body"]):
                text = body if isinstance(body, str) else (
                    bytes(body).decode("utf-8", "replace") if body is not None else ""
                )
                for agent in agents:
                    r = parse_robots_txt(text, agent)
                    allow, deny = r["allow_rules"], r["deny_rules"]
                    out.append(
                        (
                            host,
                            agent,
                            r["matched"],
                            not robots_allowed_py("/", allow, deny),
                            robots_allowed_py(probe_path, allow, deny),
                            None
                            if r["crawl_delay"] is None
                            else int(round(r["crawl_delay"] * 1000)),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "host", "agent", "matched_group",
                    "opt_out", "probe_allowed", "crawl_delay_ms",
                ],
            ).astype({"crawl_delay_ms": "object"})

    return bodies.select("host", "body").mapInPandas(emit, AGENT_MATRIX_SCHEMA)
