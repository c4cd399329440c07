"""Text analysis operators for training-data pipelines: token statistics,
heuristic language ID, quality scoring, and document fingerprinting over the
``documents`` table.

All pure column expressions (codegen, no UDFs, no shuffles beyond the final
aggregation a caller adds), each with an exact DuckDB-oracle formulation:
arithmetic uses fixed-association folds and integer ratios so values are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators.dedup import h64, shingles_col, tokens_col

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Chosen from high-frequency function words; the heuristic's value here is
# the distributed-scoring shape, not linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


# Letter runs | digit runs | single non-alphanumeric marks: a GPT-2-style
# pre-tokenization, minus the lookahead/contraction constructs, so the same
# pattern runs under both Java regex (Spark) and RE2 (DuckDB). The three
# branches match disjoint character classes, so alternation-order semantics
# cannot differ between engines.
BPE_SPLIT_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_token_count(text: Column) -> Column:
    """Subword-pre-tokenizer token count (BPE-ish): counts the non-overlapping
    matches of :data:`BPE_SPLIT_RE` — the unit a BPE vocabulary would split
    further. Pure JVM regexp, no UDF."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_RE))


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords — int/int division, exact."""
    toks = tokens_col(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.size(toks)


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_ratio(text, sw) for lang, sw in sorted(LANG_STOPWORDS.items())}


def predicted_lang(text: Column) -> Column:
    """First language (code order) attaining the maximum stopword ratio —
    a deterministic argmax whose CASE-chain form is written identically in
    the DuckDB oracle."""
    scores = lang_scores(text)
    langs = sorted(scores)
    m = F.greatest(*[scores[lang] for lang in langs])
    out = F.when(scores[langs[0]] == m, F.lit(langs[0]))
    for lang in langs[1:-1]:
        out = out.when(scores[lang] == m, F.lit(lang))
    return out.otherwise(F.lit(langs[-1]))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + mean token length
    band + non-alnum ratio penalty. Fixed-association arithmetic."""
    n_chars = F.length(text)
    n_toks = token_count(text)
    mean_tok = n_chars / n_toks
    # share of characters that are letters/digits/space
    clean = F.length(F.regexp_replace(text, "[^a-z0-9 ]", ""))
    clean_ratio = clean / n_chars
    length_band = F.when((n_chars >= 100) & (n_chars <= 2000), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    tok_band = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return length_band * 0.4 + tok_band * 0.3 + clean_ratio * 0.3


def fingerprint(text: Column, shingle_n: int = 3) -> Column:
    """Min-shingle-hash document fingerprint (winnowing-lite): stable under
    small edits away from the minimal shingle; bigint, md5-derived."""
    return F.array_min(F.transform(shingles_col(text, shingle_n), lambda s: h64(s, 0)))
