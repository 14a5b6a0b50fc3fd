"""Text-analysis operators over the ``documents`` table — Spark-first.

Each operator is specified ONCE and rendered twice: a Spark ``Column``
builder (pure built-in expressions — JVM-side, whole-stage-codegen, no
Python) and a DuckDB SQL snippet builder used by ``__spark_entry__``'s
``oracle_sql()``. Keeping both renderings adjacent in this module is what
keeps them from drifting.

Operators (SURVEY.md "training-data pipeline" extension set):
- tokenization      — lowercase ``[a-z0-9]+`` word extraction
- shingling         — k-word shingles (the MinHash/Jaccard unit)
- token stats       — counts, distinct counts, mean token length
- quality scoring   — stopword ratio, alpha ratio, mean word length
- language ID       — stopword-profile scores + deterministic argmax
- fingerprinting    — min-digest60 document fingerprint (1-perm MinHash)

Design note for 100 TB: every op here is a narrow projection over ``text``
— column pruning reaches the parquet scan, no shuffle is introduced, and
the expressions stay inside codegen. Ops that DO shuffle (dedup groupBys,
pair joins) live in rcspark.datapipe.dedupdocs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import digest60, sql_digest60

TOKEN_RE = "[a-z0-9]+"
SHINGLE_K = 3

# language-ID stopword profiles (heuristic; scored identically in both
# engines — the checked contract is the scoring function, not linguistics)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "los", "de", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("zh0", "zh1", "zh2", "zh3", "zh4"),
}
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


# -- tokenization ------------------------------------------------------------

def tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def sql_tokens(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"


# -- shingling ---------------------------------------------------------------

def shingles(toks: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles joined with spaces; [] when fewer than k tokens."""
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def sql_shingles(toks_expr: str, k: int = SHINGLE_K) -> str:
    return (
        f"CASE WHEN len({toks_expr}) < {k} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len({toks_expr}) - {k} + 2), "
        f"i -> array_to_string(list_slice({toks_expr}, i, i + {k} - 1), ' ')) END"
    )


# -- stopword / profile counting ----------------------------------------------

def count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def sql_count_in(toks_expr: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, t -> t IN ({lst})))"


# -- language ID: profile scores + deterministic argmax ------------------------

def _argmax_lang(scores: dict[str, Column]) -> Column:
    """argmax over per-language score columns; ties go to the
    alphabetically first language (the CASE chain and its SQL twin share
    that precedence by construction)."""
    langs = list(scores)
    expr = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if expr is None:
            expr = F.when(cond, branch)
        elif cond is not None:
            expr = expr.when(cond, branch)
        else:
            expr = expr.otherwise(branch)
    return expr


def _sql_argmax_lang(scores: dict[str, str]) -> str:
    langs = list(scores)
    parts = ["CASE"]
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"({scores[lang]}) >= ({scores[other]})" for other in langs[i + 1 :]
        )
        parts.append(f"WHEN {conds} THEN '{lang}'")
    parts.append(f"ELSE '{langs[-1]}' END")
    return " ".join(parts)


def lang_guess(toks: Column) -> Column:
    """Stopword-profile language ID (the fast whole-word heuristic)."""
    return _argmax_lang(
        {lang: count_in(toks, ws) for lang, ws in sorted(LANG_PROFILES.items())}
    )


def sql_lang_guess(toks_expr: str) -> str:
    return _sql_argmax_lang(
        {lang: sql_count_in(toks_expr, ws) for lang, ws in sorted(LANG_PROFILES.items())}
    )


# -- language ID, trigram-profile tier (the CLD-style upgrade) -----------------
# Character-trigram scoring: the document's padded-lowercase trigrams are
# scored against per-language trigram weight tables (here derived
# deterministically from LANG_PROFILES' vocabulary; a production deployment
# swaps in corpus-trained tables — the scoring machinery is identical).
# Everything stays in codegen: trigram explode is a substring transform,
# weights embed as a map literal, the score is one left-to-right fold.

def trigram_norm(text: Column) -> Column:
    """Space-padded lowercase normalization the trigram window slides over.

    Materialize this as its OWN column before calling char_trigrams: an
    expression referenced inside a higher-order lambda is re-evaluated per
    ELEMENT, so inlining the regex here made trigram extraction O(len²)
    (measured 15.9 s over 5k sf0.1 docs vs 3.5 s two-step)."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(text), F.lit("[^a-z0-9]+"), F.lit(" ")),
        F.lit(" "),
    )


def char_trigrams(norm: Column) -> Column:
    """Padded character trigrams of a PRE-NORMALIZED column (see
    trigram_norm; '' → [])."""
    n = F.length(norm)
    return F.when(n < 3, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), n - 2), lambda i: norm.substr(i, F.lit(3)))
    )


def sql_char_trigrams(expr: str) -> str:
    s = f"(' ' || regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g') || ' ')"
    return (
        f"CASE WHEN len({s}) < 3 THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len({s}) - 1), i -> substring({s}, i, 3)) END"
    )


def trigram_weights() -> dict[str, dict[str, int]]:
    """Per-language trigram weight tables from the profile vocabulary."""
    out: dict[str, dict[str, int]] = {}
    for lang, words in sorted(LANG_PROFILES.items()):
        w: dict[str, int] = {}
        for word in words:
            padded = f" {word} "
            for i in range(len(padded) - 2):
                tri = padded[i : i + 3]
                w[tri] = w.get(tri, 0) + 1
        out[lang] = dict(sorted(w.items()))
    return out


def trigram_score(tris: Column, weights: dict[str, int]) -> Column:
    """Σ weight(tri) over the document's trigrams.

    Formulated as Σ_w w · |{t ∈ tris : weight(t) = w}| — one codegen
    InSet filter per distinct weight value (1-2 in practice) instead of a
    per-element map lookup. (A map-literal lookup inside the fold lambda
    rebuilt the map per ELEMENT — measured 35 s over 5k docs at sf0.1,
    the same HOF codegen-collapse class PLANS.md #3 documents for
    MinHash; this form measures well under a second.)"""
    by_weight: dict[int, list[str]] = {}
    for k, v in weights.items():
        by_weight.setdefault(v, []).append(k)
    expr = None
    for w, keys in sorted(by_weight.items()):
        term = F.lit(w) * F.size(F.filter(tris, lambda t: t.isin(*keys)))
        expr = term if expr is None else expr + term
    return expr


def sql_trigram_score(tris_expr: str, weights: dict[str, int]) -> str:
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in weights.items())
    return (
        f"coalesce(list_sum(list_transform({tris_expr}, "
        f"t -> CASE t {cases} ELSE 0 END)), 0)"
    )


def lang_guess_trigram(tris: Column) -> Column:
    """argmax over trigram-table scores; `tris` = char_trigrams(norm col)."""
    return _argmax_lang(
        {lang: trigram_score(tris, w) for lang, w in trigram_weights().items()}
    )


def sql_lang_guess_trigram(expr: str) -> str:
    tris = sql_char_trigrams(expr)
    return _sql_argmax_lang(
        {lang: sql_trigram_score(tris, w) for lang, w in trigram_weights().items()}
    )


# -- corpus-TRAINED trigram tables (the production training procedure) ---------
# The testdata `documents.lang` column is a pure label (no language-salted
# vocabulary exists in the text — measured: de/es/fr/zh profile words never
# occur), so accuracy there is meaningless for ANY model; the trainer is
# pinned on planted language-salted corpora instead (tests/test_datapipe).
# All arithmetic is exact-integer (rate comparisons via cross-
# multiplication), so the procedure is deterministic and oracle-expressible.

def trigram_lang_weights(
    docs,
    langs: list[str],
    text_col: str = "text",
    label_col: str = "lang",
    min_count: int = 3,
    rate_num: int = 3,
    rate_den: int = 2,
):
    """Train a (tri, wlang) weight table from a labeled corpus: trigram t
    belongs to language l iff its occurrence RATE in l is ≥
    rate_num/rate_den times EVERY other language's rate (integers:
    rate_den·c_l·T_m ≥ rate_num·c_m·T_l) and c_l ≥ min_count.

    Scale shape: trigram counts are one map-side-combinable groupBy; the
    pairwise rate test is a self-join on trigram whose per-key fan-out is
    ≤ |langs|² — bounded by construction, never by corpus size."""
    from pyspark.sql import functions as F

    rows = docs.select(
        F.col(label_col).alias("lang"), trigram_norm(F.col(text_col)).alias("_s")
    ).select("lang", F.explode(char_trigrams(F.col("_s"))).alias("tri"))
    cnt = rows.groupBy("tri", "lang").agg(F.count("*").alias("c"))
    totals = rows.groupBy("lang").agg(F.count("*").alias("t"))
    j = cnt.join(F.broadcast(totals), "lang")
    a = j.select(
        "tri", F.col("lang").alias("wlang"), F.col("c"), F.col("t").alias("tl")
    )
    b = j.select(
        "tri", F.col("lang").alias("olang"), F.col("c").alias("oc"),
        F.col("t").alias("ot"),
    )
    viol = (
        a.join(b, "tri")
        .filter(F.col("wlang") != F.col("olang"))
        .filter(
            F.lit(rate_den) * F.col("c") * F.col("ot")
            < F.lit(rate_num) * F.col("oc") * F.col("tl")
        )
        .select("tri", "wlang")
        .distinct()
    )
    return (
        a.filter(F.col("c") >= min_count)
        .filter(F.col("wlang").isin(langs))
        .select("tri", "wlang")
        .join(viol, ["tri", "wlang"], "left_anti")
    )


def langid_trigram_trained(
    docs,
    weights,
    langs: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Score docs against a trained (tri, wlang) table → (id, lang_guess).
    The weight table is broadcast (vocabulary-scale); scoring is one
    explode + one map-side-combinable groupBy."""
    from pyspark.sql import functions as F

    rows = docs.select(
        F.col(id_col), trigram_norm(F.col(text_col)).alias("_s")
    ).select(id_col, F.explode(char_trigrams(F.col("_s"))).alias("tri"))
    joined = rows.join(F.broadcast(weights), "tri")
    scores = joined.groupBy(id_col).agg(
        *[
            F.sum((F.col("wlang") == l).cast("int")).alias(f"_s_{l}")
            for l in sorted(langs)
        ]
    )
    out = docs.select(id_col).join(scores, id_col, "left").fillna(0)
    return out.select(
        id_col,
        _argmax_lang({l: F.col(f"_s_{l}") for l in sorted(langs)}).alias("lang_guess"),
    )


# -- stratified exact cumsum (the scalable sequence-packing core) ---------------

def stratified_cumsum(
    df,
    stratum_col: str,
    order_col: str,
    val_col: str,
    out_col: str = "stream_offset",
    npartitions: int = 32,
    persisted_out: list | None = None,
):
    """+ ``out_col``: the exact running sum of ``val_col`` BEFORE each row
    within its stratum (ordered by ``order_col``) — without a per-stratum
    window, so one giant stratum never funnels through a single task.

    Same shape as schedule.assign_global_seq: range-repartition by
    (stratum, order), sort within partitions, collect ONE subtotal row per
    (partition, stratum) — driver sees npartitions·|strata| rows, never
    data — then a vectorized pandas pass adds per-group cumsums on top of
    the composed offsets. Integer-exact, deterministic, distributed.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    part = (
        df.repartitionByRange(npartitions, F.col(stratum_col), F.col(order_col))
        .sortWithinPartitions(stratum_col, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if persisted_out is not None:
        persisted_out.append(part)
    sub = part.groupBy("_pid", stratum_col).agg(F.sum(val_col).alias("_s")).collect()
    by_stratum: dict = {}
    for r in sub:
        by_stratum.setdefault(r[stratum_col], []).append((int(r["_pid"]), int(r["_s"])))
    offsets: dict = {}
    for st, lst in by_stratum.items():
        acc = 0
        for pid, s in sorted(lst):
            offsets[(pid, st)] = acc
            acc += s

    out_schema = T.StructType(
        list(part.schema.fields) + [T.StructField(out_col, T.LongType(), False)]
    )

    def add(batches):
        carry: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["_pid"].iloc[0])
            bases = {
                st: carry.get(st, offsets.get((pid, st), 0))
                for st in pdf[stratum_col].unique()
            }
            within = (
                pdf.groupby(stratum_col, sort=False)[val_col].cumsum() - pdf[val_col]
            )
            out = pdf.assign(
                **{out_col: (within + pdf[stratum_col].map(bases)).astype("int64")}
            )
            for st, tot in pdf.groupby(stratum_col, sort=False)[val_col].sum().items():
                carry[st] = bases[st] + int(tot)
            yield out

    return part.mapInPandas(add, out_schema).drop("_pid")


# -- fingerprint ---------------------------------------------------------------

def fingerprint(toks: Column, k: int = SHINGLE_K) -> Column:
    """Document fingerprint = min digest60 over k-shingles (1-perm MinHash);
    NULL for documents with fewer than k tokens."""
    return F.array_min(F.transform(shingles(toks, k), digest60))


def sql_fingerprint(toks_expr: str, k: int = SHINGLE_K) -> str:
    sh = sql_shingles(toks_expr, k)
    return f"list_min(list_transform({sh}, s -> {sql_digest60('s')}))"


# -- PII scrubbing (round 3) ---------------------------------------------------
# Curation-pipeline redaction: patterns shared verbatim between engines —
# the subset of regex syntax used ((?i), \d, \b, classes, bounded reps) is
# identical in Java regex (Spark) and RE2 (DuckDB). Replacement order is a
# fixed fold, so overlapping matches resolve identically.

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    ("PHONE", r"(?:\+\d{1,2}[-. ])?\d{3}[-. ]\d{3}[-. ]\d{4}"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def pii_scrub(text: Column) -> Column:
    """Redact e-mail / phone / IPv4 literals to [TAG] placeholders."""
    out = text
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def sql_pii_scrub(expr: str) -> str:
    out = expr
    for tag, pat in PII_PATTERNS:
        p = pat.replace("'", "''")  # DuckDB literals keep backslashes as-is
        out = f"regexp_replace({out}, '{p}', '[{tag}]', 'g')"
    return out


def pii_count(text: Column) -> Column:
    """How many PII literals the scrub would redact (Σ per-pattern hits)."""
    n = F.lit(0)
    for _tag, pat in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(text, F.lit(pat), 0))
    return n


def sql_pii_count(expr: str) -> str:
    terms = []
    for _tag, pat in PII_PATTERNS:
        p = pat.replace("'", "''")
        terms.append(f"len(regexp_extract_all({expr}, '{p}'))")
    return " + ".join(terms)


# -- chunking with overlap (round 3) -------------------------------------------

def chunk_starts(n_tokens: Column, window: int, stride: int) -> Column:
    """0-based chunk start offsets: 0, stride, 2·stride … < n_tokens."""
    return F.when(n_tokens <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_tokens - 1, F.lit(stride)).cast("array<int>")
    )


def chunk_texts(toks: Column, window: int, stride: int) -> Column:
    """Sliding windows of `window` tokens every `stride` tokens (overlap =
    window - stride), each rejoined with single spaces — the RAG/pretrain
    chunking shape (vs doc_pack_sequences, which packs WHOLE docs into
    fixed contexts). Pure higher-order codegen; trailing chunks shorten.
    """
    return F.transform(
        chunk_starts(F.size(toks), window, stride),
        lambda s: F.array_join(F.slice(toks, s + 1, window), " "),
    )


def sql_chunk_texts(toks_expr: str, window: int, stride: int) -> str:
    starts = (
        f"CASE WHEN len({toks_expr}) <= 0 THEN []::BIGINT[] "
        f"ELSE range(0, len({toks_expr}), {stride}) END"
    )
    return (
        f"list_transform({starts}, s -> "
        f"array_to_string(list_slice({toks_expr}, s + 1, s + {window}), ' '))"
    )


def cdc_chunk_stats(docs, trigger_mod: int = 8):
    """Content-defined chunking (the Rabin/Gear CDC principle at token
    granularity, [U restic/chunker, LBFS]): a chunk boundary falls AFTER
    any token whose digest60 hits ``% trigger_mod == 0``, so boundaries
    are a pure content property — inserting a token near the front shifts
    only the chunks up to the next trigger, then the cut points resync
    (the shift-resilience that fixed-stride windows lack; pinned in
    tests/test_datapipe.py).

    Input: (doc_id long, text string). Output per doc: n_tokens,
    n_chunks, max_chunk, n_shared (chunks whose digest appears in >1
    doc) and shared_ppm — the CDC dedup signal a chunk store would use.

    Scale shape: the cumulative-trigger window is DOC-partitioned (docs
    are bounded, never a global sort); chunk assembly is a (doc, chunk)
    groupBy; cross-doc sharing is one digest-keyed groupBy + join back —
    all linear hash shuffles."""
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    tok = tok.withColumn(
        "trig", (digest60(F.col("tok")) % trigger_mod == 0).cast("int")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok = tok.withColumn(
        "chunk_id", F.coalesce(F.sum("trig").over(w), F.lit(0)).cast("long")
    )
    chunks = tok.groupBy("doc_id", "chunk_id").agg(
        F.count("*").alias("clen"),
        digest60(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            )
        ).alias("cdig"),
    )
    # the chunk frame feeds BOTH the cross-doc digest census and the
    # join-back below; without a persist the tokenize + window pipeline
    # runs twice (plan audit, VERDICT r4 item 4)
    chunks = chunks.persist()
    dfreq = chunks.groupBy("cdig").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        chunks.join(dfreq, "cdig")
        .groupBy("doc_id")
        .agg(
            F.sum("clen").cast("long").alias("n_tokens"),
            F.count("*").alias("n_chunks"),
            F.max("clen").cast("long").alias("max_chunk"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).cast("long").alias(
                "n_shared"
            ),
        )
        .withColumn(
            "shared_ppm",
            F.expr("CAST(n_shared * 1000000 DIV n_chunks AS BIGINT)"),
        )
    )
