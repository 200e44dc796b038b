"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (regexp/split/sha2) so they run inside
whole-stage codegen and — crucially for the driver's correctness gate —
have exact ANSI-SQL equivalents DuckDB can replay (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textdedup import normalize_text

# tiny deterministic stopword sets per language for the n-gram/stopword
# language heuristic; must stay in sync with the SQL oracle
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

_PUNCT_CLASS = r"[.,;:!?]"
_WORD_RE = r"[A-Za-z0-9]+"


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish: alnum runs + each non-alnum-non-space char counts as one
    token (a cheap proxy for subword tokenizers)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(_PUNCT_CLASS), 0)) / F.greatest(
        F.length(col), F.lit(1)
    ).cast("double")


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    """Count tokens in the marker set (single-param lambda: pyspark's
    higher-order-function introspection treats extra defaulted params as
    the element index)."""

    def _pred(t):
        return t.isin(*markers)

    return F.size(F.filter(toks, _pred))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = F.split(normalize_text(col), " ")
    hits = _marker_hits(toks, LANG_MARKERS[lang])
    return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length / punctuation / stopword / token features + a quality flag
    (the usual pre-training heuristics: too short, no stopwords, or
    punctuation-soup documents get filtered)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars_m"),
        token_count(c).alias("n_tokens"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        (
            (token_count(c) >= 5)
            & (F.length(c) >= 30)
            & (punct_ratio(c) <= 0.2)
        ).alias("quality_ok"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-marker language heuristic: count marker-word hits per
    language over the token array; argmax with fixed en>de>fr tiebreak.
    (A real system uses fastText; the heuristic keeps the operator
    oracle-checkable and dependency-free.)"""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    scores = {lang: _marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    pred = (
        F.when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), F.lit("en"))
        .when(scores["de"] >= scores["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.select(
        F.col(id_col),
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: sha256 of normalized text (lowercased,
    whitespace-collapsed) — the canonical exact-dedup key."""
    return df.select(
        F.col(id_col), F.sha2(normalize_text(F.col(text_col)), 256).alias(out_col)
    )
