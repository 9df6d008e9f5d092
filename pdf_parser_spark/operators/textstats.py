"""Text-analysis operators for a large-scale training-data pipeline.

Language-ID, quality scoring, token counting and document
fingerprinting over a ``documents(doc_id, text, lang, source,
n_chars)`` corpus. Everything is built from JVM-side
``pyspark.sql.functions`` expressions (whole-stage codegen, zero
Python in the hot path), embarrassingly parallel per row — no
shuffle at all, so the operators scale linearly with input splits.

Determinism/oracle notes: ratios are exact int/int divisions and the
fingerprint is integer arithmetic mod a prime, so a DuckDB oracle
reproduces values bit-for-bit (see ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared stopword profiles (also used to generate the DuckDB oracle SQL
# so both engines score from the same lists).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "es"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh": ("de", "shi", "le", "zai", "wo", "you", "he", "ni"),
}

FINGERPRINT_MOD = 1_000_000_007

# BPE-ish pre-tokenizer: word runs or single non-word non-space chars.
# Same regex dialect subset works in Java regex and DuckDB RE2.
BPE_ISH_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"


def norm_tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens with runs collapsed (no empties)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


# ------------------------------------------------------------- counting

def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword-unit count + char/byte
    lengths. Pure projection — no shuffle, codegen'd."""
    toks = norm_tokens(F.col(text_col))
    return docs.withColumns({
        "n_tokens": F.size(toks),
        "n_bpe_units": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN),
                                 0)),
        "n_chars_m": F.length(F.col(text_col)),
        "n_bytes": F.octet_length(F.col(text_col)),
    })


# ------------------------------------------------------------- quality

def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1].

    Features (all exact int/int or single-division doubles so oracles
    replicate them):
      n_tokens, mean_token_len, punct_ratio (punct chars / chars),
      stopword_ratio (en-profile tokens / tokens), upper_ratio.
    Composite: clamped linear blend, the shape a C4/Gopher-style rule
    filter takes (length bounds + symbol and stopword sanity).
    """
    text = F.col(text_col)
    toks = norm_tokens(text)
    n_tok = F.size(toks)
    n_chr = F.length(text)
    n_punct = n_chr - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_upper = n_chr - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(
        toks, lambda t: t.isin(*sw)))
    mean_tok_len = F.when(
        n_tok > 0,
        (n_chr - (n_tok - F.lit(1))).cast("double") / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chr > 0,
                         n_punct.cast("double") / n_chr).otherwise(0.0)
    upper_ratio = F.when(n_chr > 0,
                         n_upper.cast("double") / n_chr).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0,
                        n_stop.cast("double") / n_tok).otherwise(0.0)
    len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(0.4) * len_score
            + F.lit(0.3) * F.least(stop_ratio * 10, F.lit(1.0))
            + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4,
                                                 F.lit(1.0)))))
    return docs.withColumns({
        "n_tokens": n_tok,
        "mean_token_len": F.round(mean_tok_len, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "upper_ratio": F.round(upper_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    })


# ------------------------------------------------------------- lang id

def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID.

    Per language L: score_L = |tokens ∩ profile_L| / n_tokens (counting
    repeats). Predicted language = argmax, ties broken by language code
    ascending (deterministic). n-gram-free heuristic but the real shape
    of fasttext-lite LID: profile hit-rates, all codegen'd.
    """
    toks = norm_tokens(F.col(text_col))
    n_tok = F.size(toks)
    def hit_ratio(sw: tuple[str, ...]) -> Column:
        # NB: the filter lambda must be unary — a default-arg closure
        # makes PySpark pass (element, index) and break isin.
        return F.when(n_tok > 0, F.size(
            F.filter(toks, lambda t: t.isin(*sw))).cast("double")
            / n_tok).otherwise(0.0)

    langs = sorted(STOPWORDS)
    # two-phase: materialize each score ONCE as a column, then argmax
    # over column references — a single-select when-chain would inline
    # every tokenize+filter tree 2^k times into pred_score
    scored = docs.withColumns({
        f"score_{lang}": F.round(hit_ratio(STOPWORDS[lang]), 6)
        for lang in langs
    })
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:  # ascending lang order => ties keep first
        sc = F.col(f"score_{lang}")
        take_new = sc > best_score
        best = F.when(take_new, F.lit(lang)).otherwise(best)
        best_score = F.when(take_new, sc).otherwise(best_score)
    return scored.withColumns({
        "pred_lang": best,
        "pred_score": F.round(best_score, 6),
    })


# --------------------------------------------------------- fingerprint

def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling-hash document fingerprint.

    fp = fold over normalized tokens w of
         (acc * 31 + ascii(w[0]) * length(w)) mod 1e9+7
    Integer arithmetic only — order-dependent but sequential in both
    engines, so the DuckDB oracle (list_reduce) matches exactly. The
    per-token value keeps the magnitude < 2^60 pre-mod (no overflow).
    """
    toks = norm_tokens(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + F.when(
            F.length(w) > 0,
            F.ascii(w).cast("long") * F.length(w)).otherwise(F.lit(0)))
        % F.lit(FINGERPRINT_MOD),
    )
    return docs.withColumn("fingerprint", fp)


# ----------------------------------------------------------- repetition

def with_repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", quality-filter appendix): heavily repetitious
    documents (boilerplate, scraper loops, keyword stuffing) are a
    standard removal class in web-scale curation.

    - ``dup_line_frac``:  fraction of lines that repeat an earlier
      line (1 - distinct/total over '\\n'-split lines)
    - ``dup_word_frac``:  same over normalized whitespace tokens
    - ``top_bigram_frac``: occurrences of the most frequent word
      bigram / total bigram occurrences (NON-distinct bigrams,
      unlike ``dedup.shingles`` which distincts for MinHash)

    Pure codegen'd projections (no shuffle, no Python). The per-doc
    top-bigram count is O(distinct_bigrams x bigrams) array work —
    bounded by document length, embarrassingly parallel, and exactly
    reproducible in DuckDB (the pytest oracle pins it cell-for-cell;
    ratios rounded to 6dp for cross-engine float stability).
    """
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        F.round((n_lines - F.size(F.array_distinct(lines)))
                / n_lines.cast("double"), 6)).otherwise(0.0)

    words = norm_tokens(F.col(text_col))
    n_words = F.size(words)
    dup_word = F.when(
        n_words > 0,
        F.round((n_words - F.size(F.array_distinct(words)))
                / n_words.cast("double"), 6)).otherwise(0.0)

    n_bg = n_words - 1
    idx = F.sequence(F.lit(0), F.greatest(n_bg - 1, F.lit(0)))
    bigrams = F.when(
        n_bg > 0,
        F.transform(idx, lambda i: F.concat_ws(
            " ", F.slice(words, i + 1, 2)))).otherwise(
        F.array().cast("array<string>"))
    top = F.array_max(F.transform(
        F.array_distinct(bigrams),
        lambda d: F.size(F.filter(bigrams, lambda x: x == d))))
    top_frac = F.when(
        n_bg > 0,
        F.round(top / n_bg.cast("double"), 6)).otherwise(0.0)

    return docs.withColumns({
        "dup_line_frac": dup_line,
        "dup_word_frac": dup_word,
        "top_bigram_frac": top_frac,
    })
