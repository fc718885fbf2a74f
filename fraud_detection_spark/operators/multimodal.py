"""Multimodal-column operators: image/audio/video payloads travel as
opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` stages.

``decode_media`` is the real decoder with per-format optional-import
codecs: WAV decodes for real via stdlib ``wave`` (even in this
codec-less container), images via PIL when installed; formats with no
importable codec raise NotImplementedError and the shared
``extract_features_auto`` stage falls back to ``fake_decode`` (a
deterministic byte-level stand-in). The Spark-side plumbing (schema,
batch iteration, partitioning) is identical on every path.

Scale posture: binary payloads stay columnar (parquet binary), the
metadata struct supports predicate pushdown on typed fields (e.g.
``media.format``), and feature extraction streams Arrow batches —
payloads are never collected to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fraud_detection_spark.registry import query
from fraud_detection_spark.sources import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType(), False)]
    + [T.StructField(f"f{i}", T.DoubleType(), True) for i in range(8)]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table: documents.text encoded as a binary payload
    plus a typed metadata struct (the real pipeline would read e.g.
    image bytes from parquet/object storage the same way)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(16000).alias("sample_rate"),
        ).alias("media"),
    )


def _image_row_features(gray_rows: "object") -> list[float]:
    """Shared image reduction: (H, W) grayscale array in [0, 1] ->
    8 row-band means (band = H/8 consecutive rows), matching the PIL
    branch's 8x8-thumbnail row means up to resampling kernel."""
    import numpy as np

    bands = np.array_split(np.asarray(gray_rows, dtype=np.float64), 8, axis=0)
    return [float(b.mean()) if b.size else 0.0 for b in bands]


def _decode_ppm_p6(payload: bytes) -> list[float]:
    """Pure-stdlib binary-PPM (P6) decoder: header (magic, whitespace/
    `#`-comment tokens, width height maxval<=255) + raw interleaved RGB
    rows. Luma via ITU-R BT.601 -> 8 row-band mean features."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header tokenizer: whitespace-separated tokens, '#' starts a
    # comment running to end-of-line; pixel data begins after exactly
    # one whitespace byte following the maxval token
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            eol = payload.find(b"\n", pos)
            pos = len(payload) if eol < 0 else eol + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(payload[start:pos])
    w, h, maxval = (int(t) for t in tokens)
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM geometry {w}x{h} maxval={maxval}")
    pos += 1  # the single whitespace byte that terminates the header
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    gray = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]) / maxval
    return _image_row_features(gray)


def _decode_bmp(payload: bytes) -> list[float]:
    """Pure-stdlib BMP decoder for the uncompressed 24bpp BITMAPINFOHEADER
    common case: bottom-up rows padded to 4 bytes, BGR byte order.
    Luma (BT.601) -> 8 row-band mean features."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24bpp BMP supported (bpp={bpp}, comp={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP geometry {w}x{h}")
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raster = payload[pix_off : pix_off + need]
    if len(raster) != need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3).astype(np.float64)
    if bottom_up:
        bgr = bgr[::-1]
    gray = (0.114 * bgr[:, :, 0] + 0.587 * bgr[:, :, 1] + 0.299 * bgr[:, :, 2]) / 255.0
    return _image_row_features(gray)


def decode_media(payload: bytes, fmt: str) -> list[float]:
    """Real decoder entry point: decode the payload for its declared
    format and reduce to the 8-dim feature contract (FEATURE_SCHEMA).

    Codec support is optional-import per format:
    - ``audio/wav``: stdlib ``wave`` — always available, genuinely
      decoded even in this codec-less container (8 segment-RMS
      features over amplitude-normalized samples);
    - ``image/x-portable-pixmap`` (binary PPM P6) and ``image/bmp``
      (uncompressed 24bpp): pure-stdlib decoders — genuinely decoded
      in this container, no PIL required;
    - other ``image/*``: PIL when installed (8x8 grayscale thumbnail
      -> 8 row-mean features), else NotImplementedError;
    - anything else (including ``text/plain``): NotImplementedError —
      callers fall back to fake_decode (see extract_features_auto).
    """
    import io

    import numpy as np

    if fmt == "audio/wav":
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 2:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:  # unsigned 8-bit WAV
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise NotImplementedError(f"unsupported WAV sample width {width}")
        if nch > 1:
            samples = samples.reshape(-1, nch).mean(axis=1)
        if len(samples) == 0:
            return [0.0] * 8
        segs = np.array_split(samples, 8)
        return [float(np.sqrt(np.mean(s * s))) if len(s) else 0.0 for s in segs]
    if fmt in ("image/x-portable-pixmap", "image/ppm"):
        return _decode_ppm_p6(payload)
    if fmt == "image/bmp":
        return _decode_bmp(payload)
    if fmt.startswith("image/"):
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                f"image decoding requires PIL (not installed): {e}"
            ) from e
        img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        arr = np.asarray(img, dtype=np.float64) / 255.0
        return [float(x) for x in arr.mean(axis=1)]
    raise NotImplementedError(
        f"no codec for format {fmt!r}; use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: an 8-bucket
    byte histogram normalized by payload length."""
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    counts = [0] * 8
    for b in payload:
        counts[b & 7] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: Arrow-batched feature extraction over binary
    payloads. Shape mirrors a real image/audio featurizer: per-batch
    vectorizable work, bounded memory, no driver involvement."""
    for pdf in batches:
        feats = pdf["payload"].map(fake_decode)
        out = pd.DataFrame({"doc_id": pdf["doc_id"]})
        for i in range(8):
            out[f"f{i}"] = feats.map(lambda v, i=i: v[i])
        yield out


def extract_features_auto(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage that runs the REAL decoder whenever a codec
    for the row's declared format is importable on the executor and
    falls back to fake_decode otherwise — one stage, both decoders,
    identical schema. Expects columns (doc_id, payload, fmt)."""
    for pdf in batches:
        rows = []
        for doc_id, payload, fmt in zip(pdf["doc_id"], pdf["payload"], pdf["fmt"]):
            try:
                v = decode_media(payload, fmt)
            except NotImplementedError:
                v = fake_decode(payload)
            rows.append((doc_id, *v))
        yield pd.DataFrame(
            rows, columns=["doc_id"] + [f"f{i}" for i in range(8)]
        )


@query(
    "q_multimodal",
    oracle=(
        "SELECT doc_id, md5(text) AS content_hash, "
        "CAST(strlen(text) AS BIGINT) AS n_bytes, "
        "CASE WHEN strlen(text) >= 256 THEN 1 ELSE 0 END AS is_large "
        "FROM documents"
    ),
    tags=("multimodal",),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: content hash (md5 over payload
    bytes), payload size from the metadata struct, size gate — the
    dedup/routing fields a multimodal ingest computes without ever
    decoding the payload."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.md5("payload").alias("content_hash"),
        F.col("media.n_bytes").alias("n_bytes"),
        F.when(F.col("media.n_bytes") >= 256, 1).otherwise(0).alias("is_large"),
    )


@query(
    "q_media_features",
    oracle=None,  # Python featurizer — rows-only + pytest determinism check
    tags=("multimodal", "udf"),
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media feature extraction: binary payload ->
    8-dim feature vector via the auto-dispatching mapInPandas stage
    (extract_features_auto). The table's text/plain payloads have no
    real codec, so they deterministically take the fake_decode path —
    but the STAGE is the same one that real-decodes WAV (stdlib) and,
    when PIL is installed, images (tests/test_ml.py codec tests)."""
    m = media_table(spark, sf_dir).select(
        "doc_id", "payload", F.col("media.format").alias("fmt")
    )
    feats = m.mapInPandas(extract_features_auto, schema=FEATURE_SCHEMA)
    return feats.select(
        "doc_id", *[F.round(F.col(f"f{i}"), 6).alias(f"f{i}") for i in range(8)]
    )
