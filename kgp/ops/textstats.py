"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure JVM expressions (whole-stage codegen) —
no Python in the hot path — and each has an exact ANSI-SQL twin for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with", "on", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
}
LANGS = sorted(STOPWORDS)

BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _tokens(text_col: str):
    return F.split(F.col(text_col), " ")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax stopword overlap; tie -> lexicographic
    first (deterministic). Emits per-language hit counts too."""
    toks = _tokens(text_col)
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
        for lang in LANGS
    }
    best = None
    for lang in LANGS:  # ascending; strictly-greater keeps the first on ties
        cond = hits[lang]
        best = (
            F.struct(cond.alias("score"), F.lit(lang).alias("lang"))
            if best is None
            else F.when(cond > best["score"], F.struct(cond.alias("score"), F.lit(lang).alias("lang"))).otherwise(best)
        )
    return df.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in LANGS],
        best["lang"].alias("pred_lang"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    features + a composite quality score in [0,1]."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    mean_wlen = (n_chars - n_tok + 1) / n_tok  # chars minus separators
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    score = (
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    return df.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_wlen.alias("mean_word_len"),
        score.alias("quality"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (letters runs,
    digit runs, single punctuation — a proxy for subword token budgets)."""
    ws = F.size(_tokens(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), F.lit(0)))
    return df.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint: min md5-int over word n-gram shingles (the
    1-permutation MinHash / winnowing-style content id)."""
    from kgp.ops.dedup import word_shingles

    sh = word_shingles(df, text_col, n)
    return sh.select(
        "doc_id",
        F.array_min(
            F.transform("shingles", lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"))
        ).alias("fingerprint"),
    )
