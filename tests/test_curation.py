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
