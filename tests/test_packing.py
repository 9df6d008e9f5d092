"""Sequence packing (operators/packing.py): hand case, chunk-budget
invariants, cell-exact DuckDB oracle, and the one-shuffle plan guard.
Since round 5 the operator is also driver-visible as the pk01_packing
registry entry (same oracle shape)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_pack_chunks_hand_case(spark):
    from pdf_parser_spark.operators.packing import pack_chunks

    # budget 10: docs of 4, 8, 0, 6, 3 tokens concat to offsets
    # [0, 4, 12, 12, 18]; doc 1 straddles chunks 0-1, doc 2 is empty
    docs = spark.createDataFrame(
        [(0, 4), (1, 8), (2, 0), (3, 6), (4, 3)],
        "doc_id long, n_tokens long")
    got = {r["doc_id"]: (r["tok_start"], r["chunk_first"],
                         r["chunk_last"], r["chunk_offset"])
           for r in pack_chunks(docs, budget=10).collect()}
    assert got == {
        0: (0, 0, 0, 0),
        1: (4, 0, 1, 4),    # tokens 4..11 straddle the 10-boundary
        2: (12, 1, 1, 2),   # empty doc: chunk_last clamps to first
        3: (12, 1, 1, 2),
        4: (18, 1, 2, 8),   # tokens 18..20 straddle the 20-boundary
    }


def test_pack_chunks_rejects_bad_budget(spark):
    from pdf_parser_spark.operators.packing import pack_chunks

    docs = spark.createDataFrame([(0, 4)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_chunks(docs, budget=0)


def test_pack_chunks_budget_invariant(spark):
    """Every chunk id below floor(total/budget) receives exactly
    ``budget`` tokens, per partition group — checked by reconstructing
    per-chunk token mass from the doc spans."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.operators.packing import pack_chunks
    from pdf_parser_spark.operators.textstats import with_token_counts

    budget = 512
    docs = with_token_counts(
        spark.read.parquet(f"{SF}/documents.parquet"))
    packed = pack_chunks(docs, budget, part_col="source").cache()
    try:
        # per-doc tokens split across its chunk span: the mass landing
        # in chunk c is min(tok_end, (c+1)*B) - max(tok_start, c*B)
        chunk = packed.select(
            "source",
            F.explode(F.sequence("chunk_first", "chunk_last"))
            .alias("chunk"),
            "tok_start", "n_tokens").select(
            "source", "chunk",
            (F.least(F.col("tok_start") + F.col("n_tokens"),
                     (F.col("chunk") + 1) * budget)
             - F.greatest(F.col("tok_start"),
                          F.col("chunk") * budget)).alias("mass"))
        sizes = (chunk.groupBy("source", "chunk")
                 .agg(F.sum("mass").alias("mass")))
        last = (packed.groupBy("source")
                .agg(F.floor(F.sum("n_tokens") / budget).alias("last")))
        bad = (sizes.join(last, "source")
               .filter((F.col("chunk") < F.col("last"))
                       & (F.col("mass") != budget)).count())
        assert bad == 0
        assert sizes.filter(F.col("mass") > budget).count() == 0
    finally:
        packed.unpersist()


def test_pack_chunks_matches_duckdb_oracle(spark):
    import duckdb

    from pdf_parser_spark.operators.packing import pack_chunks

    budget = 1000
    # n_chars as the token column: already materialized in the table,
    # so the oracle needs no tokenizer replication
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (pack_chunks(docs, budget, part_col="source",
                       tokens_col="n_chars")
           .select("doc_id", "tok_start", "chunk_first", "chunk_last",
                   "chunk_offset")
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    want = con.sql(f"""
WITH c AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS tok_end
  FROM documents)
SELECT doc_id,
       tok_end - n_chars AS tok_start,
       (tok_end - n_chars) // {budget} AS chunk_first,
       GREATEST((tok_end - 1) // {budget},
                (tok_end - n_chars) // {budget}) AS chunk_last,
       (tok_end - n_chars) % {budget} AS chunk_offset
FROM c ORDER BY doc_id
""").df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert (got[col].values == want[col].values).all(), col


def test_curation_then_pack_composition_matches_duckdb(spark):
    """End-to-end curation→packing composition, the shape a training
    run actually consumes: exact-dedup (min-id representative) →
    quality floor → per-source concat-and-chunk packing. The WHOLE
    composition is cell-exact against one DuckDB query (reusing the
    registry's tx02 quality oracle)."""
    import duckdb

    from pyspark.sql import functions as F

    from pdf_parser_spark.operators import dedup
    from pdf_parser_spark.operators import textstats as tx
    from pdf_parser_spark.operators.packing import pack_chunks
    from pdf_parser_spark.queries import CURATION_QUALITY_MIN, ORACLE_TX02

    budget = 800
    d = spark.read.parquet(f"{SF}/documents.parquet")
    keep = dedup.exact_dedup(d).select("doc_id")
    q = (tx.with_quality(d).join(keep, "doc_id", "left_semi")
         .filter(F.col("quality_score") >= CURATION_QUALITY_MIN))
    got = (pack_chunks(q, budget, part_col="source")
           .select("doc_id", "tok_start", "chunk_first", "chunk_last")
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    want = con.sql(f"""
WITH qual AS ({ORACLE_TX02}),
keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
cand AS (
  SELECT d.doc_id, d.source, q.n_tokens
  FROM documents d JOIN qual q USING (doc_id) JOIN keep USING (doc_id)
  WHERE q.quality_score >= {CURATION_QUALITY_MIN}),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS tok_end
  FROM cand)
SELECT doc_id,
       tok_end - n_tokens AS tok_start,
       (tok_end - n_tokens) // {budget} AS chunk_first,
       GREATEST((tok_end - 1) // {budget},
                (tok_end - n_tokens) // {budget}) AS chunk_last
FROM c ORDER BY doc_id
""").df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert (got[col].values == want[col].values).all(), col


def test_pack_chunks_plan_single_window(spark):
    """pack_chunks must plan as ONE window over one exchange on the
    shard key — no UDF, no second shuffle, no driver participation
    (the whole point of concat-and-chunk over bin packing)."""
    from pdf_parser_spark.operators.packing import pack_chunks

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (pack_chunks(docs, 512, part_col="source",
                        tokens_col="n_chars")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "MapInArrow"):
        assert bad not in plan
