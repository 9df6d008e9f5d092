"""Corpus-curation operators: benchmark decontamination and
deterministic source mixing.

Both are standard stages of a large-scale training-data pipeline that
sit alongside dedup/quality/langid (operators/dedup.py, textstats.py):

- decontamination: drop (or flag) training documents that share long
  word n-grams with an evaluation/benchmark set, the GPT-3-style
  "13-gram overlap" protocol (Brown et al. 2020, appendix C; carried
  forward by The Pile / Llama reports).
- source mixing: downsample each source/domain to target proportions.
  ``deterministic_sample`` uses an md5-derived uniform instead of
  ``DataFrame.sample`` so the result is reproducible run-to-run,
  independent of partitioning/AQE re-planning, and replicable in a
  DuckDB oracle cell-for-cell (Bernoulli sampling by hash is the
  standard trick for resumable pipelines — a rerun keeps exactly the
  same rows).

Scale shape: the benchmark n-gram set is tiny next to the corpus →
broadcast join, corpus side stays shuffle-free until the per-doc
aggregate; sampling is a pure codegen'd filter (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles
from .textstats import norm_tokens

CONTAMINATION_NGRAM = 5


def ngram_contamination(docs: DataFrame, benchmark: DataFrame,
                        k: int = CONTAMINATION_NGRAM,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Documents sharing at least one word ``k``-gram with the
    benchmark corpus: ``(id_col, n_overlapping)`` with the count of
    DISTINCT overlapping k-grams. Join the result back with a
    left_anti to decontaminate.

    Plan: benchmark k-grams are deduped then BROADCAST (eval sets are
    MBs next to a 100 TB corpus); the corpus explodes its distinct
    per-doc k-grams and inner-joins broadcast-side — no corpus-WIDE
    shuffle: the one exchange in the plan carries only the MATCHED
    rows (contaminated k-grams, a vanishing fraction of the corpus)
    into the per-doc aggregate.
    """
    d_sh = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), k)).alias("_ng"))
    b_sh = (benchmark
            .select(F.explode(shingles(F.col(text_col), k)).alias("_ng"))
            .distinct())
    return (d_sh.join(F.broadcast(b_sh), "_ng")
            .groupBy(id_col)
            .agg(F.countDistinct("_ng").alias("n_overlapping")))


def _hash_uniform(id_col: Column) -> Column:
    """Deterministic uniform in [0, 1) from an id: first 8 md5 hex
    chars → 32-bit int / 2^32. Engine-portable (DuckDB reproduces it
    bit-for-bit), partitioning-independent, stable across reruns."""
    return (F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8),
                   16, 10).cast("long") / F.lit(float(1 << 32)))


def deterministic_sample(docs: DataFrame,
                         fractions: dict[str, float],
                         source_col: str = "source",
                         id_col: str = "doc_id",
                         default_fraction: float = 0.0) -> DataFrame:
    """Stratified Bernoulli sampling by content-independent hash:
    keep a row iff uniform(md5(id)) < fractions[source]. Unlike
    ``DataFrame.sampleBy`` the selection is a pure deterministic
    filter — same rows on every run, every partitioning, every
    engine — which is what a resumable 100 TB mixing job needs
    (rerunning a failed wave must re-pick identical rows).
    """
    frac = None
    for src, p in sorted(fractions.items()):
        cond, lit = F.col(source_col) == src, F.lit(float(p))
        frac = F.when(cond, lit) if frac is None else frac.when(cond, lit)
    frac = (frac.otherwise(F.lit(float(default_fraction)))
            if frac is not None else F.lit(float(default_fraction)))
    return docs.filter(_hash_uniform(F.col(id_col)) < frac)


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram log10-probability table ``(tok, logp)`` from a corpus:
    p(tok) = count(tok) / total. The single-partition window computing
    ``total`` runs over the VOCABULARY (small — language vocabularies
    are millions of rows next to a 10^12-token corpus), not the corpus,
    so it is not a scale bottleneck."""
    from pyspark.sql import Window

    counts = (docs
              .select(F.explode(norm_tokens(F.col(text_col)))
                      .alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
    total = F.sum("cnt").over(Window.partitionBy())
    return counts.select(
        "tok", (F.log10(F.col("cnt")) - F.log10(total)).alias("logp"))


def unigram_logprob(docs: DataFrame, model: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style model-based quality score (Wenzek et al. 2020 use a
    KenLM 5-gram; the unigram variant keeps the identical pipeline
    shape and is exactly SQL-replicable): per document, the mean
    unigram log10-probability of its tokens under ``model`` (from
    :func:`unigram_model`, typically built on a trusted corpus), plus
    ``n_scored`` / ``n_oov`` token counts. Lower mean-logp ≈ higher
    perplexity ≈ unusual/low-quality text; out-of-vocabulary tokens
    are counted, not scored (AVG over the in-vocab tokens — identical
    to SQL AVG-ignores-NULL semantics, so the oracle replicates
    cell-for-cell without an arbitrary OOV floor constant).

    Scale shape: the model is BROADCAST (vocab is MBs next to the
    corpus); the corpus explodes tokens (no shuffle — exploded rows
    stay in their input partition) and the count/sum/avg aggregate is
    PARTIAL (map-side combine): each document collapses to at most
    one partial row per partition before the exchange, so the one
    shuffle in the plan carries ~one row per document, not the
    exploded token stream.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(norm_tokens(F.col(text_col))).alias("tok"))
    j = toks.join(F.broadcast(model), "tok", "left")
    return (j.groupBy(id_col)
            .agg(F.count("logp").alias("n_scored"),
                 F.sum(F.isnull("logp").cast("long")).alias("n_oov"),
                 F.avg("logp").alias("mean_logp")))
