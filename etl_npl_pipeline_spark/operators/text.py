"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

All four are pure Catalyst column expressions (split / filter /
regexp / aggregate lambdas) — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with the scan. On a 100 TB
corpus these are map-only: no shuffle until the caller aggregates.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

FP_MOD = 1_000_000_007
FP_BASE = 31

# Tiny per-language stopword lexicons for the heuristic language ID.
# Real deployments plug in bigger lexicons; the operator shape — a
# vectorized set-membership score per language, argmax — is the same.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "de": ("der", "die", "und", "das", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``.

    Implemented as a single codegen ``regexp_count`` with lookaround
    token boundaries instead of a ``filter`` HOF — Catalyst lambda
    HOFs are interpreted per element (the dedup.py lesson) and this
    expression runs per document across four languages in every
    lang-id/quality query; measured 2x faster at sf0.1 with
    bit-identical counts. Exactly equivalent to the token-filter
    form because \\s+-split tokens can never contain whitespace, so
    "token == stopword" is "stopword bounded by whitespace" on the
    space-padded text. (Lookbehind is Java-regex only — the DuckDB
    oracles keep the list_filter form, which is the point: two
    independent constructions, one answer.)"""
    c = F.col(col) if isinstance(col, str) else col
    alt = "|".join(LANG_STOPWORDS[lang])
    padded = F.concat(F.lit(" "), F.trim(c), F.lit(" "))
    return F.regexp_count(padded, F.lit(rf"(?<=\s)(?:{alt})(?=\s)"))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit scores."""
    return {lang: stopword_hits(col, lang) for lang in LANG_STOPWORDS}


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits; 'und' when no hits.

    Ties break by the (fixed) iteration order of LANG_STOPWORDS, so
    the result is deterministic.
    """
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores.items():
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_regex(col: Column | str, pattern: str = "[a-z0-9]+") -> Column:
    """BPE-ish token count: alnum runs (lowercase corpus); a cheap
    stand-in for subword tokenization budgets."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Integer quality features — ints keep downstream aggregation
    exact (order-independent), which the oracle gate needs."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_words = token_count_ws(c)
    stop_hits = stopword_hits(c, "en")
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "stop_hits": stop_hits,
        # crude readability band: 0 too-short, 1 ok, 2 long
        "len_band": (
            F.when(n_words < 20, F.lit(0))
            .when(n_words <= 120, F.lit(1))
            .otherwise(F.lit(2))
        ),
    }


URL_RE = r"https?://\S+"
EMAIL_RE = r"[a-z0-9._-]+@[a-z0-9.-]+"


def scrub_text(col: Column | str) -> Column:
    """Training-data cleaning pass: remove URLs and email addresses
    (PII/noise scrubbing), collapse the leftover whitespace. Pure
    regexp_replace chain — codegen, map-only."""
    c = F.col(col) if isinstance(col, str) else col
    no_url = F.regexp_replace(c, URL_RE, "")
    no_email = F.regexp_replace(no_url, EMAIL_RE, "")
    return F.trim(F.regexp_replace(no_email, r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over the characters of the text,
    ``acc = (acc*31 + ascii(ch)) mod 1e9+7`` left-to-right.

    Deterministic, engine-reproducible (exact 64-bit integer
    arithmetic — verified bit-identical to a DuckDB list_reduce),
    and runs as a codegen'd array aggregate: no UDF, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(FP_BASE) + F.ascii(ch)) % F.lit(FP_MOD),
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization: NFC unicode composition →
    lowercase → whitespace collapse → edge trim. THE first transform
    of every dedup/tokenize stage — exact dedup on un-normalized
    text silently misses e´ vs é (composed vs decomposed) and
    whitespace-variant duplicates.

    NFC needs the unicode character database, which no Catalyst
    builtin exposes — this is one of the few deliberate Python
    paths in the repo: an Arrow-batched pandas_udf over stdlib
    ``unicodedata`` (map-only, no shuffle; one batch per call, not
    per row). Everything downstream of it stays codegen.

    The contract is pinned to the oracle's (utf8proc / RE2)
    semantics so norm-hashes agree on ANY input, not just the
    current corpus: whitespace collapse is ASCII-only (RE2 ``\\s``
    never matches NBSP / U+2028), and lowering is the SIMPLE 1:1
    mapping — the only unconditional divergences from Python's full
    ``str.lower`` are U+0130 (İ → 'i', not 'i'+combining-dot) and
    the Final_Sigma context rule for U+03A3 (always 'σ', never
    'ς'), handled by a pre-translate so the bulk lowering stays a
    C-level call.
    """
    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import re
        import unicodedata

        simple = str.maketrans({"İ": "i", "Σ": "σ"})
        ws = re.compile(r"[ \t\n\r\f\v]+")

        def one(x: str | None) -> str | None:
            if x is None:
                return None
            x = unicodedata.normalize("NFC", x).translate(simple).lower()
            return ws.sub(" ", x).strip()

        return s.map(one)

    return _norm(F.col(col) if isinstance(col, str) else col)
