"""Approximate-nearest-neighbor search over an embedding column.

Two strategies over ``embeddings(vec_id, embedding array<float>,
label)``:

- ``cosine_topk``        — exact brute-force top-k: probe × corpus join,
                           cosine via zip_with/aggregate (JVM codegen,
                           no UDF), windowed row_number per probe.
                           The correctness baseline; O(P×N).
- ``lsh_cosine_topk``    — scale path: sign-random-projection LSH.
                           Deterministic seeded hyperplanes are inlined
                           as literal arrays; vectors hash to a bucket
                           (one bit per plane), the join runs only
                           within buckets (multi-probe over Hamming-1
                           neighbors for recall), then exact cosine +
                           top-k on the candidates. At 10^12 vectors the
                           bucket join shuffles only (bucket, id, vec),
                           uniformly hash-distributed — the probe side
                           is broadcast.

Float determinism: folds are left-to-right in Spark's ``aggregate``
and DuckDB's ``list_reduce`` alike, and float32→double widening is
exact, so the brute-force oracle matches bit-for-bit (rounded to 6dp
for safety).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LSH_SEED = 42


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, probe_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding"
                ) -> DataFrame:
    """Exact brute-force cosine top-k for each probe id.

    Plan shape: the probe side is a handful of rows → broadcast
    nested-loop join against the corpus (no shuffle of the corpus),
    then a window partitioned by probe (small: P×N rows shuffled on
    probe_id, bounded by P × corpus). Self-matches excluded.
    """
    # norms computed once per row BEFORE the join (same fold order →
    # bit-identical cosine, N instead of P×N norm folds)
    probes = (emb.filter(F.col(id_col).isin(probe_ids))
              .select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("probe_vec"),
                      _norm(F.col(vec_col)).alias("probe_nrm")))
    corpus = emb.select(F.col(id_col).alias("cand_id"),
                        F.col(vec_col).alias("cand_vec"),
                        _norm(F.col(vec_col)).alias("cand_nrm"))
    scored = (F.broadcast(probes).crossJoin(corpus)
              .filter(F.col("probe_id") != F.col("cand_id"))
              .withColumn("cosine", F.round(
                  _dot(F.col("probe_vec"), F.col("cand_vec"))
                  / (F.col("probe_nrm") * F.col("cand_nrm")), 6)))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "cand_id", "cosine", "rank"))


# ------------------------------------------------------------------ LSH

def hyperplanes(dim: int, n_planes: int = 8, seed: int = LSH_SEED
                ) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (seeded — no runtime RNG)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-random-projection bucket id: bit i = (vec · plane_i) > 0.
    Planes are inlined literal arrays → pure codegen expressions."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(w)) for w in plane])
        bucket = bucket + F.when(_dot(vec, lit) > 0,
                                 F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(emb: DataFrame, probe_ids: list[int], k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, dim: int = 64,
                    multiprobe_hamming1: bool = True) -> DataFrame:
    """ANN top-k: candidates from SRP-LSH buckets, exact cosine rerank.

    Probes expand to their bucket plus (optionally) all Hamming-1
    neighbor buckets — standard multi-probe, lifts recall without
    another hash table. Candidate generation is an equi-join on
    ``bucket`` (shuffle on a uniform int key; probe side broadcast),
    rerank is the exact cosine only on candidates.
    """
    planes = hyperplanes(dim, n_planes)
    bucketed = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        _norm(F.col(vec_col)).alias("cand_nrm"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"))
    probes = (emb.filter(F.col(id_col).isin(probe_ids))
              .select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("probe_vec"),
                      _norm(F.col(vec_col)).alias("probe_nrm"),
                      srp_bucket(F.col(vec_col), planes).alias("pbucket")))
    if multiprobe_hamming1:
        flips = F.array(*([F.col("pbucket")] +
                          [F.col("pbucket").bitwiseXOR(F.lit(1 << i))
                           for i in range(n_planes)]))
        probes = probes.select("probe_id", "probe_vec", "probe_nrm",
                               F.explode(flips).alias("bucket"))
    else:
        probes = probes.withColumnRenamed("pbucket", "bucket")
    cands = (F.broadcast(probes)
             .join(bucketed, "bucket")
             .filter(F.col("probe_id") != F.col("cand_id"))
             .select("probe_id", "probe_vec", "probe_nrm",
                     "cand_id", "cand_vec", "cand_nrm")
             .dropDuplicates(["probe_id", "cand_id"]))
    scored = cands.withColumn(
        "cosine", F.round(
            _dot(F.col("probe_vec"), F.col("cand_vec"))
            / (F.col("probe_nrm") * F.col("cand_nrm")), 6))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "cand_id", "cosine", "rank"))


# ------------------------------------------------------------------ IVF

def ivf_centroids(dim: int, n_centroids: int = 16,
                  seed: int = LSH_SEED + 1) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids. Random
    projections rather than learned k-means: assignment is continuous
    (near-identical vectors share an argmax cell), which is what the
    recall gate exercises; a learned codebook can be swapped in
    without touching the plan shape."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cents_lit(cents: np.ndarray) -> Column:
    return F.array(*[F.array(*[F.lit(float(w)) for w in c])
                     for c in cents])


def _cent_dots(vec: Column, cents: np.ndarray) -> Column:
    """Per-centroid dot products as ONE transform over a nested
    literal matrix — n_centroids separate top-level fold expressions
    blow the whole-stage-codegen method-size limit into interpreted
    evaluation (the measured round-1 cliff); this compact form stays
    codegen'd. Identical values, identical fold order."""
    return F.transform(_cents_lit(cents), lambda cv: _dot(vec, cv))


def _cell_of(vec: Column, cents: np.ndarray) -> Column:
    """argmax_i dot(vec, centroid_i), first index on ties — replicated
    exactly by the DuckDB oracle (row_number over d DESC, cid ASC)."""
    dots = _cent_dots(vec, cents)
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_cosine_topk(emb: DataFrame, probe_ids: list[int], k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_centroids: int = 16, n_probe: int = 4,
                    dim: int = 64) -> DataFrame:
    """IVF-style ANN top-k: corpus vectors are assigned to their argmax
    centroid cell (inverted file); each probe searches its n_probe
    best cells only; exact cosine rerank on the candidates.

    Scale shape: assignment is a pure codegen projection (n_centroids
    dot folds per vector, no shuffle); the candidate join is an
    equi-join on the int cell id (probe side broadcast); rerank cost
    is |candidates| ≈ corpus * n_probe / n_centroids per probe.
    """
    cents = ivf_centroids(dim, n_centroids)
    corpus = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        _norm(F.col(vec_col)).alias("cand_nrm"),
        _cell_of(F.col(vec_col), cents).alias("cell"))
    # per probe: rank all centroid cells by dot desc (cid asc ties),
    # keep the n_probe best — row_number semantics replicated in SQL
    probes = emb.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        _norm(F.col(vec_col)).alias("probe_nrm"))
    cells = probes.select(
        "probe_id", "probe_vec", "probe_nrm",
        F.posexplode(_cent_dots(F.col("probe_vec"), cents))
        .alias("cid", "cdot"))
    w_cells = Window.partitionBy("probe_id").orderBy(
        F.col("cdot").desc(), F.col("cid").asc())
    probe_cells = (cells
                   .withColumn("crank", F.row_number().over(w_cells))
                   .filter(F.col("crank") <= n_probe)
                   .select("probe_id", "probe_vec", "probe_nrm",
                           F.col("cid").alias("cell")))
    cands = (F.broadcast(probe_cells)
             .join(corpus, "cell")
             .filter(F.col("probe_id") != F.col("cand_id")))
    scored = cands.withColumn(
        "cosine", F.round(
            _dot(F.col("probe_vec"), F.col("cand_vec"))
            / (F.col("probe_nrm") * F.col("cand_nrm")), 6))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "cand_id", "cosine", "rank"))
