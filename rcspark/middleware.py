"""Downloader/spider-middleware column semantics (SURVEY.md §2 Table A
adjuncts): meta-refresh redirects, rel=nofollow link gating, Referer
policies, and charset detection — each as a pure whole-stage-codegen
column-expression builder PLUS a handwritten DuckDB twin (the
``sql_trap_features`` precedent in rcspark.urlnorm), so every rule is
cross-checked by the driver's hash gate.

Public models (reference mount is empty; anchors are upstream modules):
- meta refresh: [U scrapy/downloadermiddlewares/redirect.py
  ``MetaRefreshMiddleware``; w3lib/html.py ``get_meta_refresh``] — follow
  ``<meta http-equiv="refresh" content="N;url=T">`` when N <=
  METAREFRESH_MAXDELAY (default 100); a content with no url= targets the
  page itself (dedup kills it — classified ``self`` here).
- nofollow: [U scrapy/linkextractors/lxmlhtml.py] drops ``rel=nofollow``
  anchors; a page-level ``<meta name="robots" content="...nofollow...">``
  drops every link on the page (robots-meta extension).
- Referer: [U scrapy/spidermiddlewares/referer.py] implements the W3C
  Referrer-Policy states; the seven standard policies are reproduced as a
  single CASE over (policy, src, dst).
- charset: [U w3lib/encoding.py ``html_to_unicode``] — precedence here is
  pinned as BOM > HTTP header charset > meta (html5 ``charset=`` or
  http-equiv content-type) > XML declaration > utf-8 default, with alias
  folding (case, latin-1 family).

Every builder returns plain column expressions — no UDFs, no shuffles; at
100 TB these run inside the post-fetch map stage for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METAREFRESH_MAXDELAY = 100  # [U scrapy/settings/default_settings.py]

# --------------------------------------------------------------------------
# Relative-URL resolution (urljoin-lite). Bases are guaranteed by every
# caller to carry a path component ("scheme://host/..."); with no path the
# directory expression would eat the host.
# --------------------------------------------------------------------------

_ABS_RE = "^[a-z][a-z0-9+.-]*://"


def resolve_url(base: Column, ref: Column) -> Column:
    """Resolve ``ref`` against ``base``: absolute / protocol-relative /
    root-relative / directory-relative (RFC 3986 merge, no dot-segment
    normalization — canon_col owns that downstream)."""
    scheme = F.substring_index(base, "://", 1)
    origin = F.regexp_extract(base, "^([a-z][a-z0-9+.-]*://[^/]+)", 1)
    basedir = F.regexp_replace(base, "[^/]*$", "")
    return (
        F.when(ref.rlike(_ABS_RE), ref)
        .when(ref.startswith("//"), F.concat(scheme, F.lit(":"), ref))
        .when(ref.startswith("/"), F.concat(origin, ref))
        .otherwise(F.concat(basedir, ref))
    )


def sql_resolve_url(base: str, ref: str) -> str:
    return f"""CASE
        WHEN regexp_matches({ref}, '{_ABS_RE}') THEN {ref}
        WHEN {ref} LIKE '//%' THEN split_part({base}, '://', 1) || ':' || {ref}
        WHEN {ref} LIKE '/%'
          THEN regexp_extract({base}, '^([a-z][a-z0-9+.-]*://[^/]+)', 1) || {ref}
        ELSE regexp_replace({base}, '[^/]*$', '') || {ref}
      END"""


# --------------------------------------------------------------------------
# Meta refresh
# --------------------------------------------------------------------------

_MR_TAG = '(?i)<meta[^>]*http-equiv="refresh"[^>]*>'
_MR_CONTENT = '(?i)content="([^"]*)"'
_MR_SECS = "^ *([0-9]+)"
_MR_URL = '(?i); *url *= *([^ ">]+)'


def meta_refresh_cols(
    page_url: Column, body: Column, max_delay: int = METAREFRESH_MAXDELAY
) -> dict[str, Column]:
    """(interval, target, action) for a fetched page body. action ∈
    none (no refresh tag) / self (no url= → page itself) / ignore
    (interval > max_delay) / follow."""
    content = F.regexp_extract(
        F.regexp_extract(body, _MR_TAG, 0), _MR_CONTENT, 1
    )
    secs_s = F.regexp_extract(content, _MR_SECS, 1)
    interval = F.when(secs_s != "", secs_s.cast("int"))
    raw = F.regexp_extract(content, _MR_URL, 1)
    action = (
        F.when(content == "", F.lit("none"))
        .when(raw == "", F.lit("self"))
        .when(interval > max_delay, F.lit("ignore"))
        .otherwise(F.lit("follow"))
    )
    target = F.when(action == "follow", resolve_url(page_url, raw))
    return {"interval": interval, "target": target, "action": action}


def sql_meta_refresh(
    url_expr: str, body_expr: str, max_delay: int = METAREFRESH_MAXDELAY
) -> dict[str, str]:
    content = (
        f"regexp_extract(regexp_extract({body_expr}, '{_MR_TAG}', 0),"
        f" '{_MR_CONTENT}', 1)"
    )
    secs = f"regexp_extract({content}, '{_MR_SECS}', 1)"
    interval = f"CASE WHEN {secs} <> '' THEN CAST({secs} AS INT) END"
    raw = f"regexp_extract({content}, '{_MR_URL}', 1)"
    action = f"""CASE
        WHEN {content} = '' THEN 'none'
        WHEN {raw} = '' THEN 'self'
        WHEN {interval} > {max_delay} THEN 'ignore'
        ELSE 'follow' END"""
    target = (
        f"CASE WHEN ({action}) = 'follow'"
        f" THEN {sql_resolve_url(url_expr, raw)} END"
    )
    return {"interval": interval, "target": target, "action": action}


# --------------------------------------------------------------------------
# Referer policy — the seven W3C states over (src, dst). src may carry a
# fragment (stripped); origins are scheme://host (fixtures carry no ports
# or userinfo — default-port folding is canon_col's job upstream).
# --------------------------------------------------------------------------

REFERRER_POLICIES = (
    "no-referrer",
    "no-referrer-when-downgrade",
    "same-origin",
    "origin",
    "strict-origin",
    "origin-when-cross-origin",
    "strict-origin-when-cross-origin",
)

_ORIGIN_RE = "^([a-z][a-z0-9+.-]*://[^/]+)"


def referer_value(policy: Column, src: Column, dst: Column) -> Column:
    full = F.regexp_replace(src, "#.*$", "")
    origin = F.concat(F.regexp_extract(src, _ORIGIN_RE, 1), F.lit("/"))
    same = F.regexp_extract(src, _ORIGIN_RE, 1) == F.regexp_extract(
        dst, _ORIGIN_RE, 1
    )
    downgrade = src.startswith("https://") & dst.startswith("http://")
    return (
        F.when(policy == "no-referrer", F.lit(None).cast("string"))
        .when(policy == "no-referrer-when-downgrade",
              F.when(~downgrade, full))
        .when(policy == "same-origin", F.when(same, full))
        .when(policy == "origin", origin)
        .when(policy == "strict-origin", F.when(~downgrade, origin))
        .when(policy == "origin-when-cross-origin",
              F.when(same, full).otherwise(origin))
        .when(policy == "strict-origin-when-cross-origin",
              F.when(same, full).when(~downgrade, origin))
    )


def sql_referer_value(policy: str, src: str, dst: str) -> str:
    full = f"regexp_replace({src}, '#.*$', '')"
    so = f"regexp_extract({src}, '{_ORIGIN_RE}', 1)"
    do = f"regexp_extract({dst}, '{_ORIGIN_RE}', 1)"
    origin = f"({so} || '/')"
    same = f"({so} = {do})"
    downgrade = f"({src} LIKE 'https://%' AND {dst} LIKE 'http://%')"
    return f"""CASE {policy}
        WHEN 'no-referrer' THEN NULL
        WHEN 'no-referrer-when-downgrade'
          THEN CASE WHEN NOT {downgrade} THEN {full} END
        WHEN 'same-origin' THEN CASE WHEN {same} THEN {full} END
        WHEN 'origin' THEN {origin}
        WHEN 'strict-origin' THEN CASE WHEN NOT {downgrade} THEN {origin} END
        WHEN 'origin-when-cross-origin'
          THEN CASE WHEN {same} THEN {full} ELSE {origin} END
        WHEN 'strict-origin-when-cross-origin'
          THEN CASE WHEN {same} THEN {full}
                    WHEN NOT {downgrade} THEN {origin} END
      END"""


# --------------------------------------------------------------------------
# Charset detection (string-plane: bytes already transferred; the UTF-16
# BOM byte-plane path lives in fetch ingest, not here)
# --------------------------------------------------------------------------

_HDR_CS = "(?i)charset= *([a-zA-Z0-9_-]+)"
_META_CS = '(?i)<meta[^>]*charset="?([a-zA-Z0-9_-]+)'
_XML_CS = '(?i)^<\\?xml[^>]*encoding="([a-zA-Z0-9_-]+)"'
_BOM = "\ufeff"


def _norm_enc(c: Column) -> Column:
    low = F.lower(c)
    return (
        F.when(low.isin("latin-1", "latin1", "iso8859-1", "cp819"),
               F.lit("iso-8859-1"))
        .when(low.isin("utf8", "u8"), F.lit("utf-8"))
        .otherwise(low)
    )


def charset_cols(header: Column, body: Column) -> dict[str, Column]:
    hdr = F.regexp_extract(header, _HDR_CS, 1)
    meta = F.regexp_extract(body, _META_CS, 1)
    xml = F.regexp_extract(body, _XML_CS, 1)
    source = (
        F.when(body.startswith(_BOM), F.lit("bom"))
        .when(hdr != "", F.lit("header"))
        .when(meta != "", F.lit("meta"))
        .when(xml != "", F.lit("xmldecl"))
        .otherwise(F.lit("default"))
    )
    enc = (
        F.when(source == "bom", F.lit("utf-8"))
        .when(source == "header", _norm_enc(hdr))
        .when(source == "meta", _norm_enc(meta))
        .when(source == "xmldecl", _norm_enc(xml))
        .otherwise(F.lit("utf-8"))
    )
    return {"encoding": enc, "source": source}


def _sql_norm(e: str) -> str:
    return f"""CASE
        WHEN lower({e}) IN ('latin-1','latin1','iso8859-1','cp819')
          THEN 'iso-8859-1'
        WHEN lower({e}) IN ('utf8','u8') THEN 'utf-8'
        ELSE lower({e}) END"""


def sql_charset(header_expr: str, body_expr: str) -> dict[str, str]:
    hdr = f"regexp_extract({header_expr}, '{_HDR_CS}', 1)"
    meta = f"regexp_extract({body_expr}, '{_META_CS}', 1)"
    xml = f"regexp_extract({body_expr}, '{_XML_CS}', 1)"
    bom = f"starts_with({body_expr}, chr(65279))"
    source = f"""CASE
        WHEN {bom} THEN 'bom'
        WHEN {hdr} <> '' THEN 'header'
        WHEN {meta} <> '' THEN 'meta'
        WHEN {xml} <> '' THEN 'xmldecl'
        ELSE 'default' END"""
    enc = f"""CASE ({source})
        WHEN 'bom' THEN 'utf-8'
        WHEN 'header' THEN {_sql_norm(hdr)}
        WHEN 'meta' THEN {_sql_norm(meta)}
        WHEN 'xmldecl' THEN {_sql_norm(xml)}
        ELSE 'utf-8' END"""
    return {"encoding": enc, "source": source}


# --------------------------------------------------------------------------
# Content-Encoding decode ([U scrapy/downloadermiddlewares/httpcompression.py
# HttpCompressionMiddleware]): gzip + deflate (zlib-wrapped with the raw
# fallback scrapy ships) with a hard decoded-size bound — the
# decompression-bomb guard DOWNLOAD_MAXSIZE applies to the DECODED body.
# Python-side on purpose (zlib is not a SQL surface); callers wrap it in a
# mapInPandas batch, and the driver oracle re-derives the expected
# plaintext by formula, so the whole decode path sits under the hash gate.
# --------------------------------------------------------------------------

RETRY_AFTER_MAX = 3600  # cap honored wait (RFC 9110 permits any; we clamp)

_RA_DATE_RE = (
    "^[A-Za-z]{3}, ([0-9]{2}) ([A-Za-z]{3}) ([0-9]{4})"
    " ([0-9]{2}):([0-9]{2}):([0-9]{2}) GMT$"
)
_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


def _civil_epoch_cols(day, month, year, hh, mi, ss):
    """Seconds-since-1970 from split IMF-fixdate fields, in pure integer
    arithmetic (Howard Hinnant's days_from_civil) — no timestamp types, so
    both engines agree bit-for-bit regardless of session timezone. All
    intermediates < 2^53; years are AD so floor==trunc division is safe."""
    yadj = year - F.when(month <= 2, 1).otherwise(0)
    era = F.floor(yadj / 400).cast("long")
    yoe = yadj - era * 400
    mp = (month + 9) % 12
    doy = F.floor((mp * 153 + 2) / 5).cast("long") + day - 1
    doe = (
        yoe * 365
        + F.floor(yoe / 4).cast("long")
        - F.floor(yoe / 100).cast("long")
        + doy
    )
    days = era * 146097 + doe - 719468
    return days * 86400 + hh * 3600 + mi * 60 + ss


def retry_after_cols(
    header: Column, resp_epoch: Column, max_wait: int = RETRY_AFTER_MAX
) -> dict[str, Column]:
    """Retry-After parse ([U RFC 9110 §10.2.3]; scrapy's RetryMiddleware
    ignores the header — honoring it on 429/503 is the production
    extension every polite crawler ships). Two grammars: delta-seconds
    and IMF-fixdate; wait is clamped to [0, max_wait]; anything else
    parses to NULL with mode='none'."""
    h = F.trim(header)
    is_delta = h.rlike("^[0-9]{1,7}$")
    g = [F.regexp_extract(h, _RA_DATE_RE, i) for i in range(7)]
    is_date = g[0] != ""
    month = F.lit(None).cast("long")
    for i, name in enumerate(_MONTHS):
        month = F.when(g[2] == name, F.lit(i + 1).cast("long")).otherwise(month)
    epoch = _civil_epoch_cols(
        g[1].cast("long"), month, g[3].cast("long"),
        g[4].cast("long"), g[5].cast("long"), g[6].cast("long"),
    )
    cap = F.lit(max_wait).cast("long")
    # clamp INSIDE the branches: least(NULL, k) drops the NULL in Spark
    # (and only in newer DuckDB), so clamping a NULL wait would fabricate
    # a wait for unparseable headers
    wait = (
        F.when(is_delta, F.least(h.cast("long"), cap))
        .when(is_date & month.isNotNull(),
              F.least(F.greatest(epoch - resp_epoch, F.lit(0).cast("long")), cap))
    )
    mode = (
        F.when(is_delta, F.lit("delta"))
        .when(is_date & month.isNotNull(), F.lit("date"))
        .otherwise(F.lit("none"))
    )
    return {"wait_s": wait, "mode": mode}


def sql_retry_after(
    header: str, resp_epoch: str, max_wait: int = RETRY_AFTER_MAX
) -> dict[str, str]:
    h = f"trim({header})"
    is_delta = f"regexp_matches({h}, '^[0-9]{{1,7}}$')"
    g = [f"regexp_extract({h}, '{_RA_DATE_RE}', {i})" for i in range(7)]
    is_date = f"({g[0]} <> '')"
    month = "CASE " + " ".join(
        f"WHEN {g[2]} = '{n}' THEN {i + 1}" for i, n in enumerate(_MONTHS)
    ) + " END"
    yadj = f"(CAST({g[3]} AS BIGINT) - CASE WHEN ({month}) <= 2 THEN 1 ELSE 0 END)"
    era = f"({yadj} // 400)"
    yoe = f"({yadj} - {era} * 400)"
    mp = f"((({month}) + 9) % 12)"
    doy = f"(({mp} * 153 + 2) // 5 + CAST({g[1]} AS BIGINT) - 1)"
    doe = f"({yoe} * 365 + {yoe} // 4 - {yoe} // 100 + {doy})"
    days = f"({era} * 146097 + {doe} - 719468)"
    epoch = (
        f"({days} * 86400 + CAST({g[4]} AS BIGINT) * 3600"
        f" + CAST({g[5]} AS BIGINT) * 60 + CAST({g[6]} AS BIGINT))"
    )
    wait = f"""CASE
        WHEN {is_delta} THEN least(CAST({h} AS BIGINT), {max_wait})
        WHEN {is_date} AND ({month}) IS NOT NULL
          THEN least(greatest({epoch} - {resp_epoch}, 0), {max_wait}) END"""
    mode = f"""CASE
        WHEN {is_delta} THEN 'delta'
        WHEN {is_date} AND ({month}) IS NOT NULL THEN 'date'
        ELSE 'none' END"""
    return {"wait_s": wait, "mode": mode}


# --------------------------------------------------------------------------
# AJAX-crawlable URLs ([U scrapy/downloadermiddlewares/ajaxcrawl.py;
# w3lib/url.py; Google's AJAX crawling scheme]): a '#!' fragment — or a
# fragment-free page declaring <meta name="fragment" content="!"> — maps to
# the '_escaped_fragment_' fetch URL the origin serves a snapshot at.
# Percent-encoding is pinned to the reserved subset fixtures can produce
# (% # & = + space), applied '%' first so the escapes never double-encode.
# --------------------------------------------------------------------------

_AJAX_META = '(?i)<meta[^>]*name="fragment"[^>]*content="!"'
_PCT = (("%", "%25"), ("#", "%23"), ("&", "%26"),
        ("=", "%3D"), ("+", "%2B"), (" ", "%20"))


def _pct_encode(c: Column) -> Column:
    for lit, esc in _PCT:
        c = F.replace(c, F.lit(lit), F.lit(esc))
    return c


def ajaxcrawl_cols(url: Column, body: Column) -> dict[str, Column]:
    has_hb = url.contains("#!")
    frag = F.regexp_extract(url, "#!(.*)$", 1)
    base = F.regexp_replace(url, "#.*$", "")
    sep = F.when(base.contains("?"), F.lit("&")).otherwise(F.lit("?"))
    has_meta = body.rlike(_AJAX_META)
    ef = F.concat(base, sep, F.lit("_escaped_fragment_="))
    fetch = (
        F.when(has_hb, F.concat(ef, _pct_encode(frag)))
        .when(has_meta, ef)
        .otherwise(url)
    )
    return {"crawlable": (has_hb | has_meta), "fetch_url": fetch}


def sql_ajaxcrawl(url: str, body: str) -> dict[str, str]:
    has_hb = f"(position('#!' IN {url}) > 0)"
    frag = f"regexp_extract({url}, '#!(.*)$', 1)"
    base = f"regexp_replace({url}, '#.*$', '')"
    sep = f"CASE WHEN position('?' IN {base}) > 0 THEN '&' ELSE '?' END"
    enc = frag
    for lit, esc in _PCT:
        enc = f"replace({enc}, '{lit}', '{esc}')"
    has_meta = f"regexp_matches({body}, '{_AJAX_META}')"
    ef = f"({base} || ({sep}) || '_escaped_fragment_=')"
    fetch = f"""CASE
        WHEN {has_hb} THEN {ef} || {enc}
        WHEN {has_meta} THEN {ef}
        ELSE {url} END"""
    return {"crawlable": f"({has_hb} OR {has_meta})", "fetch_url": fetch}


# --------------------------------------------------------------------------
# Robots META / X-Robots-Tag directives ([U Google robots-meta spec;
# scrapy honors neither natively — page-level noindex/nofollow is the
# corpus-hygiene extension]): meta tag and header UNION (a directive from
# either source applies); 'none' == 'noindex, nofollow'.
# --------------------------------------------------------------------------

_ROBOTS_META = '(?i)<meta[^>]*name="robots"[^>]*content="([^"]*)"'


def robots_meta_cols(header_tag: Column, body: Column) -> dict[str, Column]:
    # coalesce BOTH sources to '' — a NULL X-Robots-Tag header (the common
    # case) must not null the whole concat and mask a meta-tag directive
    meta = F.regexp_extract(F.coalesce(body, F.lit("")), _ROBOTS_META, 1)
    combined = F.concat(
        F.lit(","),
        F.replace(F.lower(meta), F.lit(" "), F.lit("")),
        F.lit(","),
        F.replace(F.lower(F.coalesce(header_tag, F.lit(""))), F.lit(" "),
                  F.lit("")),
        F.lit(","),
    )
    noindex = combined.contains(",noindex,") | combined.contains(",none,")
    nofollow = combined.contains(",nofollow,") | combined.contains(",none,")
    return {"noindex": noindex, "nofollow": nofollow}


def sql_robots_meta(header_tag: str, body: str) -> dict[str, str]:
    meta = f"regexp_extract(coalesce({body}, ''), '{_ROBOTS_META}', 1)"
    combined = (
        f"(',' || replace(lower({meta}), ' ', '') || ','"
        f" || replace(lower(coalesce({header_tag}, '')), ' ', '') || ',')"
    )
    return {
        "noindex": f"(position(',noindex,' IN {combined}) > 0"
                   f" OR position(',none,' IN {combined}) > 0)",
        "nofollow": f"(position(',nofollow,' IN {combined}) > 0"
                    f" OR position(',none,' IN {combined}) > 0)",
    }


def decode_body(data: bytes, encoding: str, max_size: int) -> tuple[bytes, bool]:
    """(decoded_prefix, bomb): decode up to max_size bytes; bomb=True when
    the full decoded body would exceed max_size (output is the exact
    max_size-byte prefix — deterministic, so it can be hash-gated)."""
    import zlib

    if encoding == "identity" or encoding == "":
        return data[:max_size], len(data) > max_size
    if encoding == "gzip":
        d = zlib.decompressobj(wbits=31)
    elif encoding == "deflate":
        try:
            out = zlib.decompressobj(wbits=15).decompress(data, max_size + 1)
            return out[:max_size], len(out) > max_size
        except zlib.error:
            d = zlib.decompressobj(wbits=-15)  # raw-deflate fallback [U scrapy]
    else:
        raise ValueError(f"unsupported Content-Encoding {encoding!r}")
    out = d.decompress(data, max_size + 1)
    return out[:max_size], len(out) > max_size
