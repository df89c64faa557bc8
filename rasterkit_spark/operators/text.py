"""Text-analysis operators over the ``documents`` table — the training-data
pipeline ops the north star adds on top of RasterKit parity: language ID,
quality scoring, token counting, document fingerprinting.

Every operator here is expressed with *portable* relational primitives
(length / replace / md5 / integer arithmetic) so the DuckDB oracle in
``__spark_entry__.py`` can run the byte-identical formula.  A second,
richer regex tokenizer is provided for engine use where oracle parity
isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny marker lexicons per language (stopword-style voting)
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "de", "y"],
    "fr": ["le", "la", "et", "des"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "是", "了", "在"],
}

#: languages written WITHOUT inter-word spaces: their markers must be
#: counted as bare substrings — the space-delimited needle " 的 " never
#: occurs in unsegmented Chinese prose, structurally pinning score_zh to 0
NONSPACED_LANGS = {"zh"}


def marker_needle(code: str, word: str) -> str:
    """The literal needle counted for a marker word — space-delimited for
    space-segmented languages, bare substring for NONSPACED_LANGS.  Both
    the engine Columns and the DuckDB oracle derive needles HERE, so the
    two sides cannot drift."""
    return word if code in NONSPACED_LANGS else f" {word} "


STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

FINGERPRINT_MOD = 1_000_000_007


def ws_token_count(text: Column) -> Column:
    """Whitespace token count via pure length arithmetic (portable):
    tokens = len(trim) - len(remove-spaces(trim)) + 1 for non-empty text.
    Robust to engine-specific split semantics."""
    t = F.trim(text)
    n_spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(n_spaces + 1)


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish sub-word estimate (~chars/4, the
    common byte-pair heuristic) per doc."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        ws_token_count(t).cast("long").alias("ws_tokens"),
        F.ceil(F.length(t) / 4).cast("long").alias("bpe_tokens_est"),
    )


def regex_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Engine-grade tokenizer (GPT-2-style word/number/punct regex) — not
    oracle-matched (regex dialects differ across engines)."""
    pat = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
         .cast("long").alias("regex_tokens"))


def count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring via length arithmetic (portable)."""
    return ((F.length(text)
             - F.length(F.replace(text, F.lit(needle), F.lit(""))))
            / len(needle)).cast("long")


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics.

    All ratios are scaled to integers (×1e6, floor) so float formatting can
    never break oracle comparison.  score = 100 − penalties."""
    t = F.col(text_col)
    n_chars = F.length(t)
    tokens = ws_token_count(t)
    punct = sum([count_occurrences(t, c) for c in [".", ",", "!", "?", ";"]],
                F.lit(0).cast("long"))
    stop_hits = sum(
        [count_occurrences(F.concat(F.lit(" "), t, F.lit(" ")), f" {w} ")
         for w in STOPWORDS], F.lit(0).cast("long"))
    mean_word_len = F.when(tokens > 0, n_chars / tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(tokens > 0, stop_hits / tokens).otherwise(F.lit(0.0))
    score = (F.lit(100.0)
             - F.when(n_chars < 50, 30.0).otherwise(0.0)
             - F.when(punct_ratio > 0.1, 20.0).otherwise(0.0)
             - F.when(stop_ratio < 0.05, 15.0).otherwise(0.0)
             - F.when(mean_word_len > 12.0, 10.0).otherwise(0.0))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_m"),
        tokens.cast("long").alias("ws_tokens"),
        F.floor(punct_ratio * 1e6).cast("long").alias("punct_ratio_e6"),
        F.floor(stop_ratio * 1e6).cast("long").alias("stop_ratio_e6"),
        F.floor(mean_word_len * 1e6).cast("long").alias("mean_word_len_e6"),
        score.cast("long").alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word voting language ID: count lexicon hits per language in
    the padded text; argmax with deterministic code tie-break."""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = []
    for code, words in sorted(LANG_MARKERS.items()):
        s = sum([count_occurrences(t, marker_needle(code, w))
                 for w in words], F.lit(0).cast("long"))
        scores.append((code, s))
    # argmax via greatest + chained when (ties → alphabetically first code)
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("unknown")
    for code, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(code)).otherwise(pred)
    return docs.select("doc_id", *[s.alias(f"score_{c}") for c, s in scores],
                       pred.alias("lang_pred"))


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-weighted rolling-hash-style fingerprint, fully portable:
    fp = Σ_i (1+i)·code(text[i]) mod 1e9+7 over the first 256 chars.

    Implemented with sequence+transform+aggregate (higher-order functions,
    JVM-side) — the per-char weight makes it order-sensitive like a rolling
    hash while staying an associative SUM underneath."""
    t = F.substring(F.col(text_col), 1, 256)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1)))
    terms = F.transform(
        idx, lambda i: i.cast("long") * F.ascii(F.substring(t, i, 1)).cast("long"))
    fp = F.aggregate(terms, F.lit(0).cast("long"),
                     lambda acc, x: (acc + x) % FINGERPRINT_MOD)
    return docs.select(
        "doc_id",
        F.when(F.length(t) == 0, F.lit(0)).otherwise(fp).alias("fingerprint"))
