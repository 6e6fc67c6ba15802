"""Text analysis: language ID, quality scoring, token counting, fingerprints.

All pure JVM column expressions (regexp + array functions) — no Python in
the hot path; each op has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small fixed stopword profiles (heuristic language ID — the mechanism is
# the deliverable; profiles are engine data like the alias dictionary)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "los", "que"],
    "fr": ["le", "la", "les", "des", "une"],
    "de": ["der", "die", "das", "und", "ein"],
}

def _toks():
    # built lazily: Column construction needs an active SparkContext
    return F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0))


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_types, n_chars_seen, bpe_est).

    bpe_est is the standard chars/4 heuristic for BPE token count.
    """
    return docs.select(
        "doc_id",
        F.size(_toks()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(_toks())).cast("long").alias("n_types"),
        F.length("text").cast("long").alias("n_chars_seen"),
        F.ceil(F.length("text") / 4).cast("long").alias("bpe_est"),
    )


def _hits(lang: str):
    words = LANG_PROFILES[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(_toks(), lambda t: F.array_contains(arr, t))
    )


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, confidence): argmax stopword-profile hits,
    deterministic tie-break by profile order (en < es < fr < de as listed).
    """
    langs = list(LANG_PROFILES)
    scored = docs.select(
        "doc_id",
        F.size(_toks()).alias("_n"),
        *[_hits(lg).alias(f"_h_{lg}") for lg in langs],
    )
    # argmax via greatest + chained when (first profile wins ties)
    best = F.greatest(*[F.col(f"_h_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(F.col(f"_h_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.round(
            best / F.greatest(F.col("_n"), F.lit(1)), 6
        ).alias("confidence"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, type_token_ratio, avg_word_len, score).

    Heuristic pretraining-quality features: stopword density, lexical
    diversity, mean word length; `score` is a fixed linear blend.
    """
    en = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_tok = F.size(_toks())
    stop = F.size(F.filter(_toks(), lambda t: F.array_contains(en, t)))
    types = F.size(F.array_distinct(_toks()))
    tot_len = F.aggregate(
        _toks(), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    safe_n = F.greatest(n_tok, F.lit(1))
    stop_ratio = stop / safe_n
    ttr = types / safe_n
    awl = tot_len / safe_n
    score = (
        F.lit(0.4) * ttr
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * F.least(awl / 8, F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(awl, 6).alias("avg_word_len"),
        F.round(score, 6).alias("score"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp_full, fp_head): content fingerprints — full-text md5 and
    a 64-char-prefix md5 (cheap candidate key for prefix-dup detection).
    Deterministic and identical in DuckDB (md5 is md5)."""
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp_full"),
        F.md5(F.substring("text", 1, 64)).alias("fp_head"),
    )
