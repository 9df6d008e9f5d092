"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct, exactly like the PDF payloads do. The Spark-side
plumbing — schema, partitioning, mapInPandas batch shape, frame
sampling — is real and tested.

Decode is REAL for JPEG payloads since round 3: ``decode_meta`` runs
the in-repo T.81 decoder (``kernel/jpegdec.py``) on any payload with a
JPEG SOI marker, reporting decoded width/height/channels
(decoder='jpegdec'); ``with_jpeg_payloads`` plants deterministic
encoder-built JPEG fixtures on a doc_id-keyed subset so the path is
exercised (and oracle-able) without external data. PIL is probed next
for other container formats; everything else falls back to the
clearly-marked deterministic fake (header arithmetic on payload
length + byte sum) because this container ships no image/audio
libraries — swap that last resort for libvips/ffmpeg on a real
cluster; nothing else changes.

Scale: decode is embarrassingly parallel (no shuffle); batches cross
the Arrow boundary once per ~256 rows (session.py caps batch rows
because payloads are fat), and only (id, payload) columns are sent to
Python — metadata joins back by id if other columns are needed.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("byte_sum", T.LongType()),
    T.StructField("decoder", T.StringType()),
])

FRAME_STRIDE = 256


def as_media(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Wrap a corpus as (doc_id, modality, payload binary). In
    production the payload column IS the stored image/audio bytes; here
    the documents' utf-8 bytes stand in (deterministic, same plumbing)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"))


JPEG_EVERY = 5
# three deterministic gray fixture shapes — distinct dims so the
# decoded metadata is discriminative per doc_id
JPEG_SPECS = ((16, 8), (24, 16), (8, 32))


@lru_cache(maxsize=None)
def jpeg_fixture(i: int) -> bytes:
    """Deterministic baseline-JPEG fixture bytes (gradient gray raster
    encoded by the in-repo codec) — stands in for stored image blobs."""
    from pdf_parser_spark.kernel.jpegdec import encode_baseline_jpeg

    w, h = JPEG_SPECS[i % len(JPEG_SPECS)]
    px = bytes((x * 7 + y * 13 + i * 29) % 256
               for y in range(h) for x in range(w))
    return encode_baseline_jpeg(px, w, h, 1)


def with_jpeg_payloads(media: DataFrame,
                       every: int = JPEG_EVERY) -> DataFrame:
    """Replace the payload of every ``every``-th doc (doc_id-keyed)
    with one of the deterministic JPEG fixtures — pure codegen (binary
    literals in a when-chain, no UDF), so the real-decode path is
    driven without any external data."""
    m3 = F.pmod(F.col("doc_id"), F.lit(len(JPEG_SPECS)))
    pick = F.when(m3 == 0, F.lit(jpeg_fixture(0)))
    for i in range(1, len(JPEG_SPECS) - 1):
        pick = pick.when(m3 == i, F.lit(jpeg_fixture(i)))
    pick = pick.otherwise(F.lit(jpeg_fixture(len(JPEG_SPECS) - 1)))
    is_jpeg = F.pmod(F.col("doc_id"), F.lit(every)) == 0
    return media.withColumn(
        "payload", F.when(is_jpeg, pick).otherwise(F.col("payload")))


def _try_jpegdec(payload: bytes) -> dict | None:
    """REAL decode via the in-repo T.81 decoder for JPEG payloads
    (SOI-marker gated; utf-8 text can never contain 0xFF, so document
    stand-in payloads always skip this)."""
    if not payload.startswith(b"\xff\xd8"):
        return None
    from pdf_parser_spark.kernel.jpegdec import JpegError, decode_baseline_jpeg
    try:
        w, h, n, _pixels = decode_baseline_jpeg(payload)
    except JpegError:
        return None
    return {"n_bytes": len(payload), "width": w, "height": h,
            "channels": n, "byte_sum": sum(payload) % 65536,
            "decoder": "jpegdec"}


def _fake_decode(payload: bytes) -> dict:
    """STUB codec — deterministic arithmetic standing in for a real
    image decode. Replace with PIL/libvips on a real cluster."""
    import numpy as np
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 1 + n % 640,
        "height": 1 + (n * 31) % 480,
        "channels": 3,
        "byte_sum": int(np.frombuffer(payload, dtype=np.uint8)
                        .sum(dtype=np.int64) % 65536),
        "decoder": "fake",
    }


_PIL_CHECKED: list = []  # [module] once probed (failed imports are not
# cached by Python — a per-row try costs a full sys.path scan each time)


def _pil():
    if not _PIL_CHECKED:
        try:
            from PIL import Image
            _PIL_CHECKED.append(Image)
        except ImportError:
            _PIL_CHECKED.append(None)
    return _PIL_CHECKED[0]


def _try_real_decode(payload: bytes) -> dict | None:
    """Real decoder path, gated behind a one-time import probe."""
    Image = _pil()
    if Image is None:
        return None
    import io
    try:
        with Image.open(io.BytesIO(payload)) as im:
            return {"n_bytes": len(payload), "width": im.width,
                    "height": im.height,
                    "channels": len(im.getbands()),
                    "byte_sum": sum(payload) % 65536,
                    "decoder": "pil"}
    except Exception:
        return None


def decode_meta(media: DataFrame) -> DataFrame:
    """mapInPandas decode: one Python call per Arrow batch, emitting a
    typed metadata row per payload (UDTF-shaped like the PDF kernel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                metas.append(_try_jpegdec(data)
                             or _try_real_decode(data)
                             or _fake_decode(data))
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["channels"] = out["channels"].astype("int32")
            yield out

    return (media.select("doc_id", "modality", "payload")
            .mapInPandas(run, schema=DECODE_META_SCHEMA))


def frame_sample(media: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Sample 'frames' every ``stride`` bytes: one output row per frame
    with its byte offset — the video-frame-sampling shape, as a pure
    codegen'd posexplode(sequence(...)), no Python at all."""
    n = F.octet_length("payload")
    frames = F.when(
        n > 0, F.sequence(F.lit(0), F.floor((n - 1) / stride)))
    return (media
            .select("doc_id", "modality", n.alias("n_bytes"),
                    F.posexplode(frames).alias("frame_idx", "_f"))
            .select("doc_id", "modality", "n_bytes",
                    F.col("frame_idx").cast("int").alias("frame_idx"),
                    (F.col("frame_idx") * stride).cast("long")
                    .alias("byte_offset")))
