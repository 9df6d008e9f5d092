"""The extraction operator: PDF-bytes-in-turn-rows -> extracted text.

This is the Spark face of the kernel (SURVEY.md §2.6 "UDF surface"):
ONE ``mapInArrow`` kernel processes whole Arrow record batches — zero
per-row Python<->JVM crossings (north_rule). The kernel never raises:
malformed documents produce ``parse_error`` rows (the reference
instead panics, src/lib.rs:68).

Why mapInArrow and not mapInPandas: the output carries a
``spans array<struct>`` column; going through pandas means per-row
Python tuples -> object arrays -> Arrow struct conversion, which
measured ~6x slower than the whole parse itself. Building the nested
column directly as (flat struct arrays + offsets) keeps the Arrow
encode at C speed.

Scale design (100 TB / 10^12 turns):
- the operator is embarrassingly parallel per turn; no shuffle is
  *required* — ``extract_turns`` adds one only when ``salt`` is set, to
  split skewed long conversations across tasks (safe: turns independent)
- column pruning: only (conv_id, turn_idx, text) cross the Arrow
  boundary; everything else stays JVM-side and is re-joined by the
  caller if needed
- Arrow batch size is capped in session.py because rows are PDF-fat
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(T.StructType([
    T.StructField("page", T.IntegerType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("font", T.StringType()),
    T.StructField("s", T.StringType()),
]))

# FIXTURES.md §2 output schema
EXTRACT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("spans", SPAN_TYPE),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("n_objects", T.IntegerType()),
    T.StructField("bytes", T.LongType()),
    T.StructField("parse_error", T.StringType()),
])

_SPAN_ARROW = pa.list_(pa.struct([
    ("page", pa.int32()), ("x", pa.float64()), ("y", pa.float64()),
    ("font", pa.string()), ("s", pa.string())]))


def _extract_batches(batches: Iterator[pa.RecordBatch]
                     ) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: one Python call per Arrow batch; nested spans
    output assembled from flat arrays + offsets (no pandas objects)."""
    from pdf_parser_spark.kernel.extract import extract_text

    for batch in batches:
        texts, n_pages, n_objects, nbytes, errors = [], [], [], [], []
        sp_page, sp_x, sp_y, sp_font, sp_s = [], [], [], [], []
        offsets = [0]
        for raw in batch.column("text").to_pylist():
            try:
                data = raw.encode("latin-1") if raw is not None else b""
            except UnicodeEncodeError:
                data = b""
            if not data:
                res = {"text": "", "spans": [], "n_pages": 0,
                       "n_objects": 0, "bytes": 0,
                       "parse_error": "EmptyOrNonLatin1Payload"}
            else:
                res = extract_text(data)
            texts.append(res["text"])
            n_pages.append(res["n_pages"])
            n_objects.append(res["n_objects"])
            nbytes.append(res["bytes"])
            errors.append(res["parse_error"])
            for page, x, y, font, s in res["spans"]:
                sp_page.append(page)
                sp_x.append(x)
                sp_y.append(y)
                sp_font.append(font)
                sp_s.append(s)
            offsets.append(len(sp_page))
        struct = pa.StructArray.from_arrays(
            [pa.array(sp_page, pa.int32()), pa.array(sp_x, pa.float64()),
             pa.array(sp_y, pa.float64()), pa.array(sp_font, pa.string()),
             pa.array(sp_s, pa.string())],
            ["page", "x", "y", "font", "s"])
        spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         struct)
        yield pa.RecordBatch.from_arrays(
            [batch.column("conv_id"),
             batch.column("turn_idx").cast(pa.int32()),
             pa.array(texts, pa.string()),
             spans.cast(_SPAN_ARROW),
             pa.array(n_pages, pa.int32()),
             pa.array(n_objects, pa.int32()),
             pa.array(nbytes, pa.int64()),
             pa.array(errors, pa.string())],
            names=["conv_id", "turn_idx", "text", "spans", "n_pages",
                   "n_objects", "bytes", "parse_error"])


IMAGE_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("page", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("colorspace", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("data", T.BinaryType()),
])


def _extract_image_batches(batches: Iterator[pa.RecordBatch]
                           ) -> Iterator[pa.RecordBatch]:
    """UDTF-shaped kernel: one input turn row → 0..N image rows (the
    reference's PDF::extract_image surface, src/lib.rs:60-72; order
    made deterministic by object number, SURVEY §2.7.4)."""
    from pdf_parser_spark.kernel.extract import extract_text

    for batch in batches:
        conv, tix = [], []
        pages, names, widths, heights, spaces, fmts, datas = \
            [], [], [], [], [], [], []
        for cid, t, raw in zip(batch.column("conv_id").to_pylist(),
                               batch.column("turn_idx").to_pylist(),
                               batch.column("text").to_pylist()):
            try:
                data = raw.encode("latin-1") if raw is not None else b""
            except UnicodeEncodeError:
                data = b""
            res = extract_text(data, with_images=True) if data else \
                {"images": []}
            for img in res.get("images", []):
                conv.append(cid)
                tix.append(t)
                pages.append(img["page"])
                names.append(img["name"])
                widths.append(img["width"])
                heights.append(img["height"])
                spaces.append(img["colorspace"])
                fmts.append(img["format"])
                datas.append(img["data"])
        yield pa.RecordBatch.from_arrays(
            [pa.array(conv, pa.string()),
             pa.array(tix, pa.int32()),
             pa.array(pages, pa.int32()),
             pa.array(names, pa.string()),
             pa.array(widths, pa.int32()),
             pa.array(heights, pa.int32()),
             pa.array(spaces, pa.string()),
             pa.array(fmts, pa.string()),
             pa.array(datas, pa.binary())],
            names=["conv_id", "turn_idx", "page", "name", "width",
                   "height", "colorspace", "format", "data"])


def extract_images(turns: DataFrame) -> DataFrame:
    """Image extraction (one row per image — explode semantics done in
    the kernel). Same scale properties as extract_turns."""
    slim = turns.select("conv_id", "turn_idx", "text")
    return slim.mapInArrow(_extract_image_batches, schema=IMAGE_SCHEMA)


def extract_turns(turns: DataFrame, salt: int | None = None,
                  partitions: int | None = None) -> DataFrame:
    """Run the extraction kernel over a turns DataFrame.

    ``salt``/``partitions``: optional skew-safe repartition — hash on
    (conv_id, salt) where salt = pmod(xxhash64(conv_id, turn_idx), salt)
    so one multi-thousand-turn conversation spreads over ``salt`` tasks
    (north_rule: explicit salting for skewed long conversations).
    Projection to (conv_id, turn_idx, text) happens FIRST so only those
    columns shuffle and cross the Arrow boundary.
    """
    slim = turns.select("conv_id", "turn_idx", "text")
    if salt is not None and partitions is not None:
        slim = slim.repartition(
            partitions,
            F.xxhash64("conv_id"),
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt)),
        )
    return slim.mapInArrow(_extract_batches, schema=EXTRACT_SCHEMA)


def _encode_jpeg_batches(batches: Iterator[pa.RecordBatch]
                         ) -> Iterator[pa.RecordBatch]:
    from pdf_parser_spark.kernel.jpegdec import JpegError, encode_baseline_jpeg

    for batch in batches:
        cols = {n: batch.column(n).to_pylist()
                for n in batch.schema.names}
        out_fmt, out_data = [], []
        for fmt, w, h, data in zip(cols["format"], cols["width"],
                                   cols["height"], cols["data"]):
            if fmt == "raw-rgb":
                # never-abort contract: a raster whose byte length
                # disagrees with width*height*3 (malformed upstream
                # stream) must not kill the Spark task — forward the
                # row unchanged instead
                try:
                    out_data.append(encode_baseline_jpeg(data, w, h, 3))
                    out_fmt.append("jpeg")
                except (JpegError, ValueError):
                    out_fmt.append(fmt)
                    out_data.append(data)
            else:  # already JPEG (non-baseline passthrough)
                out_fmt.append(fmt)
                out_data.append(data)
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols["conv_id"], pa.string()),
             pa.array(cols["turn_idx"], pa.int32()),
             pa.array(cols["page"], pa.int32()),
             pa.array(cols["name"], pa.string()),
             pa.array(cols["width"], pa.int32()),
             pa.array(cols["height"], pa.int32()),
             pa.array(cols["colorspace"], pa.string()),
             pa.array(out_fmt, pa.string()),
             pa.array(out_data, pa.binary())],
            names=["conv_id", "turn_idx", "page", "name", "width",
                   "height", "colorspace", "format", "data"])


def encode_images_jpeg(images: DataFrame) -> DataFrame:
    """JPEG sink parity (ref src/main.rs:36-42 re-encodes every
    extracted raster with JpegEncoder before writing): raw-rgb rows
    are baseline-JPEG encoded by the in-repo codec; rows that stayed
    JPEG (non-baseline passthrough) are forwarded. Same schema, so
    a parquet write of this frame is the reference's image sink as a
    distributed table."""
    return images.mapInArrow(_encode_jpeg_batches, schema=IMAGE_SCHEMA)


def extract_turns_dedup(turns: DataFrame) -> DataFrame:
    """Distinct-document extraction: hash the payload, run the kernel
    once per DISTINCT document, then join results back to every turn.

    At 10^12-turn scale duplicated payloads are the norm (retried
    tool calls, forwarded transcripts, boilerplate attachments); the
    Python kernel is the expensive stage, so paying one digest-hash
    shuffle + one join to run it once per distinct payload wins
    whenever per-payload kernel cost × (1 - 1/dup_factor) exceeds
    ~one shuffle pass over the payload bytes (bench.py's dedup_lever
    stage measures both sides). Same output schema and rows as
    ``extract_turns`` (equality asserted in
    tests/test_pipeline_e2e.py::test_extract_dedup_equals_direct).

    Shape (scale notes):
    1. JVM-side ``dropDuplicates`` on the digest — its partial
       aggregate is the map-side combine, so duplicate payload bytes
       co-located in an input partition never reach the shuffle (a
       degenerate corpus-wide duplicate ships once per input
       partition, not once per row), and all dedup work stays in
       codegen. (A mapInArrow pre-dedup variant was measured 2x
       SLOWER end-to-end: every extra Arrow stage ships the full
       payload bytes JVM->Python->JVM again.)
    2. explicit-width round-robin repartition of the (small) distinct
       set before the kernel — AQE sizes post-shuffle partitions by
       BYTES (64MB advisory), which was measured collapsing the
       kernel stage to a SINGLE partition on a 64MB distinct set
       (~1ms/doc of kernel dwarfs ~µs/doc of shuffle, so kernel
       partitions must be CPU-sized, not byte-sized); a
       user-specified repartition count is exempt from coalescing;
    3. equi-join of the slim (conv_id, turn_idx, digest) rows back to
       the per-digest results (AQE picks broadcast when results fit).
    """
    slim = turns.select("conv_id", "turn_idx", "text")
    # NULL text digests to NULL and NULL keys never equi-join — those
    # turns would silently vanish. The kernel already treats NULL and
    # empty payloads identically (both parse b""), so folding NULL
    # into the empty digest is semantics-preserving.
    keyed = slim.withColumn(
        "_digest", F.md5(F.coalesce(F.col("text"), F.lit(""))))
    spark = turns.sparkSession
    try:
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle_n = 0
    n_kernel = max(spark.sparkContext.defaultParallelism * 2, shuffle_n)
    docs = (keyed.select("_digest", "text")
            .dropDuplicates(["_digest"])
            .repartition(n_kernel)
            .select(F.col("_digest").alias("conv_id"),
                    F.lit(0).cast("int").alias("turn_idx"), "text"))
    ext = (docs.mapInArrow(_extract_batches, schema=EXTRACT_SCHEMA)
           .select(F.col("conv_id").alias("_digest"),
                   F.col("text").alias("_etext"), "spans", "n_pages",
                   "n_objects", "bytes", "parse_error"))
    return (keyed.drop("text").join(ext, "_digest")
            .select("conv_id", "turn_idx",
                    F.col("_etext").alias("text"), "spans", "n_pages",
                    "n_objects", "bytes", "parse_error"))
