"""Decontamination + deterministic source-mix sampling
(operators/curation.py), incl. cell-exact DuckDB oracles run from
pytest (the driver registry is capped at 50 entries)."""

from __future__ import annotations


def test_contamination_hand_case(spark):
    from pdf_parser_spark.operators.curation import ngram_contamination

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "completely unrelated text with no overlap at all here"),
         (2, "again the quick brown fox jumps right over everything")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps over something")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_overlapping"]
           for r in ngram_contamination(docs, bench, k=5).collect()}
    # doc0 shares 'the quick brown fox jumps' and
    # 'quick brown fox jumps over'; doc2 only the former; doc1 none
    assert got == {0: 2, 2: 1}


def test_contamination_matches_duckdb_oracle(spark):
    import duckdb

    from pdf_parser_spark.operators.curation import ngram_contamination

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    bench = docs.filter("doc_id % 7 = 0")  # synthetic benchmark slice
    got = (ngram_contamination(docs, bench, k=3)
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{sf}/documents.parquet'")
    want = con.sql(r"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct(list_transform(range(0, len(w) - 2),
                   i -> array_to_string(w[i+1:i+3], ' ')))
              ELSE [array_to_string(w, ' ')] END AS ng
  FROM (SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\s+',
                                                ' ', 'g')), ' ') AS w
        FROM documents)),
b AS (SELECT DISTINCT unnest(ng) AS g FROM sh WHERE doc_id % 7 = 0),
d AS (SELECT doc_id, unnest(ng) AS g FROM sh)
SELECT doc_id, COUNT(DISTINCT g) AS n_overlapping
FROM d JOIN b USING (g) GROUP BY doc_id ORDER BY doc_id
""").df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["n_overlapping"].values
            == want["n_overlapping"].values).all()


def test_deterministic_sample_reproducible_and_stratified(spark):
    from pdf_parser_spark.operators.curation import deterministic_sample

    import hashlib

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    s1 = deterministic_sample(docs, fr)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    # rerun on a different partitioning -> identical selection
    ids2 = {r["doc_id"] for r in
            deterministic_sample(docs.repartition(7), fr)
            .select("doc_id").collect()}
    assert ids1 == ids2

    # selection is a pure function of (doc_id, source): recompute the
    # exact expected id set in python and require equality
    rows = docs.select("doc_id", "source").collect()
    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) / (1 << 32)
    want = {r["doc_id"] for r in rows
            if u(r["doc_id"]) < fr.get(r["source"], 0.0)}
    assert ids1 == want and len(want) > 0
    srcs = {r["doc_id"]: r["source"] for r in rows}
    assert not any(srcs[i] == "src2" for i in ids1)   # frac 0
    assert all(i in ids1 for i in srcs
               if srcs[i] == "src0")                  # frac 1


def test_deterministic_sample_matches_duckdb_oracle(spark):
    import duckdb

    from pdf_parser_spark.operators.curation import deterministic_sample

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    fr = {"src3": 0.3, "src4": 0.7}
    got = sorted(r["doc_id"] for r in
                 deterministic_sample(docs, fr).select("doc_id")
                 .collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{sf}/documents.parquet'")
    want = [r[0] for r in con.sql("""
SELECT doc_id FROM documents
WHERE ('0x' || md5(doc_id::VARCHAR)[1:8])::BIGINT
      / 4294967296.0
      < CASE source WHEN 'src3' THEN 0.3 WHEN 'src4' THEN 0.7
        ELSE 0.0 END
ORDER BY doc_id
""").fetchall()]
    assert got == want and len(got) > 0


def test_deterministic_sample_monotone_in_fraction(spark):
    """Bernoulli-by-hash is monotone: raising a source's fraction only
    ADDS rows (the kept set at p1 is a subset of the kept set at
    p2 >= p1) — the property that makes mixing ratios tunable without
    reshuffling previously selected data."""
    from pdf_parser_spark.operators.curation import deterministic_sample

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    ids = {}
    for p in (0.2, 0.5, 0.9):
        ids[p] = {r["doc_id"] for r in
                  deterministic_sample(docs, {"src0": p, "src1": p})
                  .select("doc_id").collect()}
    assert ids[0.2] <= ids[0.5] <= ids[0.9]
    assert len(ids[0.2]) < len(ids[0.9])


def test_unigram_logprob_hand_case(spark):
    import math

    from pdf_parser_spark.operators.curation import (
        unigram_logprob, unigram_model,
    )

    model_docs = spark.createDataFrame(
        [(0, "a a a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a zz"), (3, "zz qq")],
        "doc_id long, text string")
    m = unigram_model(model_docs)  # p(a)=3/4, p(b)=1/4
    got = {r["doc_id"]: (r["n_scored"], r["n_oov"], r["mean_logp"])
           for r in unigram_logprob(docs, m).collect()}
    la, lb = math.log10(3 / 4), math.log10(1 / 4)
    assert got[1][0:2] == (2, 0)
    assert abs(got[1][2] - (la + lb) / 2) < 1e-12
    assert got[2][0:2] == (1, 1) and abs(got[2][2] - la) < 1e-12
    assert got[3] == (0, 2, None)  # all OOV: AVG over nothing


def test_unigram_logprob_matches_duckdb_oracle(spark):
    import duckdb
    import numpy as np

    from pdf_parser_spark.operators.curation import (
        unigram_logprob, unigram_model,
    )
    from pdf_parser_spark.queries import _TOKS_SQL

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    model = unigram_model(docs.filter("doc_id % 2 = 0"))
    got = (unigram_logprob(docs, model)
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{sf}/documents.parquet'")
    want = con.sql(f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
counts AS (
  SELECT tok, COUNT(*) AS cnt FROM toks
  WHERE doc_id % 2 = 0 GROUP BY tok),
m AS (SELECT tok, log10(cnt) - log10(SUM(cnt) OVER ()) AS logp
      FROM counts)
SELECT doc_id,
       COUNT(logp) AS n_scored,
       SUM(CASE WHEN logp IS NULL THEN 1 ELSE 0 END) AS n_oov,
       AVG(logp) AS mean_logp
FROM toks LEFT JOIN m USING (tok)
GROUP BY doc_id ORDER BY doc_id
""").df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["n_scored"].values == want["n_scored"].values).all()
    assert (got["n_oov"].values == want["n_oov"].values).all()
    # float aggregation order differs between engines: tolerance, not
    # bit-equality (both columns are non-null here on sf0.001)
    np.testing.assert_allclose(got["mean_logp"].astype(float),
                               want["mean_logp"].astype(float),
                               rtol=1e-9)


def test_unigram_logprob_broadcasts_model(spark):
    """The model side must BROADCAST; the corpus must not shuffle
    before its per-doc aggregate (same contract as contamination)."""
    from pdf_parser_spark.operators.curation import (
        unigram_logprob, unigram_model,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    model = unigram_model(docs.filter("doc_id % 2 = 0"))
    plan = (unigram_logprob(docs, model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
