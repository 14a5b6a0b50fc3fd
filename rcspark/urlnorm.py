"""URL canonicalization — SURVEY.md A2 (w3lib.canonicalize_url semantics +
north_star tracking-param strip).

Two twin implementations that MUST agree byte-for-byte (tests assert it):

- ``canon_col(url)``   — pure Spark column expression (parse_url + lower +
  higher-order filter/array_sort on the query kv array). Stays JVM-side /
  whole-stage-codegen: no Python in the hot path, filters/pruning push
  through it.
- ``canon_py(url)``    — pure Python, used by the oracle simulator and by
  the fixture generator.

Spec (rcspark.constants):
  1. scheme and host lowercased; userinfo stripped; default port stripped
     (http:80, https:443).
  2. fragment dropped.
  3. query split on '&'; empty parts and tracking params
     (TRACKING_PARAM_RE on the key) dropped; remaining "k=v" strings sorted
     lexicographically; rejoined with '&'.
  4. empty path → '/'.
  5. reassembled scheme://host[:port]path[?query]. Percent-encoding is
     preserved as-is; no dot-segment resolution (generator never emits them).

Malformed URLs (no scheme/host) canonicalize to NULL/None and are dropped
by the frontier.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

from .constants import DEFAULT_PORTS, TRACKING_PARAM_RE

_KEY_RE = TRACKING_PARAM_RE


def _canon_query_col(query: Column) -> Column:
    parts = F.split(query, "&")
    kept = F.filter(
        parts,
        lambda p: (p != F.lit(""))
        & ~F.substring_index(p, "=", 1).rlike(_KEY_RE),
    )
    return F.concat_ws("&", F.array_sort(kept))


def canon_col(url: Column) -> Column:
    """Canonical URL as a Spark column expression (NULL if unparseable)."""
    url = F.trim(url)
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    # AUTHORITY = [userinfo@]host[:port]; strip userinfo, lowercase.
    auth = F.lower(F.substring_index(F.parse_url(url, F.lit("AUTHORITY")), "@", -1))
    # strip default port per scheme
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    q = _canon_query_col(F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")))
    out = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme.isNull() | auth.isNull() | (auth == ""), F.lit(None)).otherwise(out)


# ---------------------------------------------------------------------------
# Python twin (oracle / fixtures)
# ---------------------------------------------------------------------------

import re

_TRACK = re.compile(TRACKING_PARAM_RE)


def canon_py(url: str) -> str | None:
    """Pure-Python twin of canon_col; None for unparseable URLs."""
    try:
        sp = urlsplit(url.strip())
    except ValueError:
        return None
    if not sp.scheme or not sp.netloc:
        return None
    scheme = sp.scheme.lower()
    netloc = sp.netloc.rsplit("@", 1)[-1].lower()
    host, colon, port = netloc.partition(":")
    if colon and port.isdigit() and DEFAULT_PORTS.get(scheme) == int(port):
        netloc = host
    path = sp.path or "/"
    kept = [
        p
        for p in sp.query.split("&")
        if p != "" and not _TRACK.match(p.split("=", 1)[0])
    ]
    q = "&".join(sorted(kept))
    return f"{scheme}://{netloc}{path}" + (f"?{q}" if q else "")


# -- Crawler-trap heuristics (round 3) ----------------------------------------
# Structural URL signals every production frontier gates on before
# scheduling: path depth, repeated path segments (/a/a/a/ mirrors,
# session-id loops), and query-parameter explosion (faceted-search /
# calendar traps). Pure codegen column expressions with an exact SQL twin
# so the whole detector sits inside the cross-engine hash gate.
# [U scrapy depth middleware; heritrix PathologicalPath/TooManyPath rules]

TRAP_MAX_DEPTH = 8     # segments before 'trap-depth'
TRAP_MAX_REPEAT = 3    # duplicated segments before 'trap-repeat'
TRAP_MAX_PARAMS = 8    # query params before 'trap-params'


def _segs_col(url: Column) -> Column:
    path = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    return F.filter(F.split(path, "/"), lambda x: x != "")


def trap_features(url: Column) -> dict[str, Column]:
    """{depth, n_repeat, n_params, verdict} — verdict precedence is
    params > repeat > depth (explosion traps fire first; a deep repeated
    path reports the more specific repeat cause)."""
    segs = _segs_col(url)
    depth = F.size(segs).cast("long")
    n_repeat = (F.size(segs) - F.size(F.array_distinct(segs))).cast("long")
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&"))).cast("long")
    verdict = (
        F.when(n_params > TRAP_MAX_PARAMS, F.lit("trap-params"))
        .when(n_repeat >= TRAP_MAX_REPEAT, F.lit("trap-repeat"))
        .when(depth > TRAP_MAX_DEPTH, F.lit("trap-depth"))
        .otherwise(F.lit("ok"))
    )
    return {"depth": depth, "n_repeat": n_repeat, "n_params": n_params, "verdict": verdict}


def sql_trap_features(url_expr: str) -> dict[str, str]:
    """DuckDB twins of trap_features over `url_expr` (expects a CTE column;
    NOTE DuckDB string literals keep backslashes as-is — single-escape)."""
    segs = (
        f"list_filter(string_split(regexp_extract({url_expr},"
        f" '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?', 1), '/'), x -> x <> '')"
    )
    q = f"regexp_extract({url_expr}, '\\?([^#]*)', 1)"
    depth = f"CAST(len({segs}) AS BIGINT)"
    n_repeat = f"CAST(len({segs}) - len(list_distinct({segs})) AS BIGINT)"
    n_params = f"CAST(CASE WHEN {q} = '' THEN 0 ELSE len(string_split({q}, '&')) END AS BIGINT)"
    verdict = (
        f"CASE WHEN {n_params} > {TRAP_MAX_PARAMS} THEN 'trap-params' "
        f"WHEN {n_repeat} >= {TRAP_MAX_REPEAT} THEN 'trap-repeat' "
        f"WHEN {depth} > {TRAP_MAX_DEPTH} THEN 'trap-depth' ELSE 'ok' END"
    )
    return {"depth": depth, "n_repeat": n_repeat, "n_params": n_params, "verdict": verdict}


def idna_host(host_col):
    """Arrow-batched IDN → ASCII host fold ([U RFC 3490/3492; scrapy's
    w3lib.url safe-url handling]): each label runs the stdlib `idna`
    codec (nameprep + punycode, the same table every browser applies),
    ASCII labels pass through lowercased. A pandas UDF because punycode's
    bias-adaptation loop is genuinely per-label stateful — but the batch
    transfer is Arrow and the codec is C-backed, so this is the
    sanctioned vectorized-UDF tier, not per-row Python in the plan."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # resolve the (string) type hints under
    # `from __future__ import annotations` — pandas_udf eval's them in
    # this module's globals

    def _one(h):
        # quarantine, don't crash the stage: a single malformed public-web
        # host (empty label, >63-char label, BIDI violation, null) yields
        # NULL for the caller to filter/flag, never an executor abort
        if h is None:
            return None
        try:
            return h.encode("idna").decode("ascii")
        except (UnicodeError, ValueError):
            return None

    @pandas_udf("string")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(_one)

    return _enc(host_col)
