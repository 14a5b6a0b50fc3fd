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

def lang_guess(toks: Column) -> Column:
    """argmax over LANG_PROFILES scores; ties go to the alphabetically
    first language (the CASE chain below and its SQL twin share that
    precedence by construction)."""
    scores = {lang: count_in(toks, ws) for lang, ws in sorted(LANG_PROFILES.items())}
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


def sql_lang_guess(toks_expr: str) -> str:
    scores = {
        lang: sql_count_in(toks_expr, ws) for lang, ws in sorted(LANG_PROFILES.items())
    }
    langs = list(scores)
    parts = ["CASE"]
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"({scores[lang]}) >= ({scores[other]})" for other in langs[i + 1 :]
        )
        parts.append(f"WHEN {conds} THEN '{lang}'")
    parts.append(f"ELSE '{langs[-1]}' END")
    return " ".join(parts)


# -- fingerprint ---------------------------------------------------------------

def fingerprint(toks: Column, k: int = SHINGLE_K) -> Column:
    """Document fingerprint = min digest60 over k-shingles (1-perm MinHash);
    NULL for documents with fewer than k tokens."""
    return F.array_min(F.transform(shingles(toks, k), digest60))


def sql_fingerprint(toks_expr: str, k: int = SHINGLE_K) -> str:
    sh = sql_shingles(toks_expr, k)
    return f"list_min(list_transform({sh}, s -> {sql_digest60('s')}))"
