"""pdf_parser_spark — a PySpark-native PDF text/image extraction engine.

A from-scratch reimplementation of the capabilities of the reference
``Kotaro7750/pdf_parser`` (Rust), re-architected for Apache Spark:

- ``kernel/``    pure-Python PDF parsing core (no Spark imports): COS
  lexer/parser, stream filters, xref/trailer, page tree, content-stream
  text interpreter, image decode. Runs *inside* Arrow-batched
  ``mapInPandas`` kernels — never per-row Python.
- ``operators/`` Spark DataFrame operators: extraction, dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
  text-quality statistics, multimodal column plumbing.
- ``pipeline/``  production job layer: salted repartition for skewed
  conversations, per-partition lineage rows, idempotent resume.
- ``sources/``   table abstraction (parquet dirs; Iceberg when jars are
  present) + the deterministic synthetic ``turns`` generator.
"""

__version__ = "0.1.0"
