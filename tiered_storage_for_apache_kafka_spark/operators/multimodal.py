"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched (mapInPandas) decode / feature-extract stages.

Design (per the brief): image/audio/video are `BINARY` columns with a
metadata struct; decode and feature extraction run as Pandas UDFs over
`mapInPandas` so bytes never round-trip through Python row-at-a-time.
Every image/audio/video container here is decoded by REAL pure-Python
codecs implemented from the public specs — netpbm PPM, PNG (stdlib
zlib + scanline unfilters), baseline JPEG (`jpeg_codec`: DCT, Huffman,
byte stuffing), RIFF/WAVE PCM16, YUV4MPEG2 — and the feature math is
oracle-checked (`multimodal_*_decode` reproduce the byte-level features
in DuckDB SQL, proving the Arrow path computes exactly what it claims).

At 100 TB: assets are hash-partitioned by asset id; feature extraction is
a narrow map stage (no shuffle); per-task memory is bounded by Arrow
batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table, scan_parallel

ASSET_SCHEMA = (
    "doc_id BIGINT, media_type STRING, blob BINARY, "
    "meta STRUCT<source: STRING, n_bytes: BIGINT, encoding: STRING>"
)


def multimodal_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model the documents table as a multimodal asset table: the text
    payload stands in for opaque media bytes (deterministic, so features
    are oracle-checkable); metadata is a typed struct."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        blob.alias("blob"),
        F.struct(
            F.col("source").alias("source"),
            F.length(blob).cast("bigint").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> "np.ndarray":
    """Dispatching image decode — every format decoded for real by the
    pure-Python codecs in this package: PPM (decode_ppm), PNG
    (decode_png, stdlib zlib), baseline JPEG (jpeg_codec.decode_jpeg).
    The Spark plumbing that hosts them is `extract_features` below
    (same mapInPandas shape)."""
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    if blob[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
            decode_jpeg,
        )

        return decode_jpeg(blob)
    raise ValueError("unrecognized image payload (PPM/PNG/JPEG supported)")


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: byte sum,
    min/max byte, and a content hash — the stand-in for embedding/
    thumbnail extraction, with identical batch shape."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": int(arr.size),
                        "byte_sum": int(arr.sum(dtype=np.int64)),
                        "byte_min": int(arr.min()) if arr.size else 0,
                        "byte_max": int(arr.max()) if arr.size else 0,
                        "content_md5": hashlib.md5(blob).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        feats,
        schema=(
            "doc_id BIGINT, n_bytes BIGINT, byte_sum BIGINT, "
            "byte_min BIGINT, byte_max BIGINT, content_md5 STRING"
        ),
    )


@query(
    "multimodal_decode_features",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(1, LENGTH(text) + 1),
                                    i -> unicode(text[i]))) AS BIGINT) AS byte_sum,
       CAST(list_min(list_transform(range(1, LENGTH(text) + 1),
                                    i -> unicode(text[i]))) AS BIGINT) AS byte_min,
       CAST(list_max(list_transform(range(1, LENGTH(text) + 1),
                                    i -> unicode(text[i]))) AS BIGINT) AS byte_max,
       md5(text) AS content_md5
FROM documents
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas feature extractor, hash-matched against a pure-SQL
    byte-level recomputation (ASCII payloads ⇒ codepoint == byte)."""
    return extract_features(multimodal_assets(spark, sf_dir))


@query(
    "multimodal_asset_catalog",
    oracle="""
SELECT source,
       COUNT(*) AS n_assets,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_bytes,
       CAST(MAX(LENGTH(text)) AS BIGINT) AS max_bytes
FROM documents
GROUP BY source
""",
)
def multimodal_asset_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog rollup over the asset table's metadata struct (no blob
    access — metadata-only planning, the cheap path a 100 TB catalog
    query must take; column pruning keeps the blob column unread)."""
    assets = multimodal_assets(spark, sf_dir)
    return assets.groupBy(F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("meta.n_bytes").cast("bigint").alias("total_bytes"),
        F.max("meta.n_bytes").cast("bigint").alias("max_bytes"),
    )


FRAME_BYTES = 256  # deterministic fake "frame" size
FRAME_STRIDE = 4  # keep every 4th frame


def sample_frames(assets: DataFrame) -> DataFrame:
    """Frame sampling (the video path): cut each blob into fixed-size
    frames, keep every FRAME_STRIDE-th, emit per-frame features. One
    input row fans out to n_frames/stride rows inside the Arrow batch —
    the exact shape a real ffmpeg frame sampler would have (decode
    replaced by deterministic byte slicing; swap `blob[a:b]` for a real
    frame decode in production). Narrow map stage: no shuffle."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = (len(blob) + FRAME_BYTES - 1) // FRAME_BYTES
                for f in range(0, n_frames, FRAME_STRIDE):
                    frame = blob[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_no": f,
                            "frame_bytes": len(frame),
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_no", "frame_bytes", "frame_md5"],
            )

    return assets.mapInPandas(
        frames,
        schema="doc_id BIGINT, frame_no INT, frame_bytes INT, frame_md5 STRING",
    )


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """REAL image resize, no PIL/libvips: decode (any supported format
    via decode_image), nearest-neighbor sample to (height, width) with
    the standard index map floor((i + 0.5) * src / dst), re-encode as
    binary PPM (RGB) — the deterministic thumbnailing kernel of an image
    pipeline. `sample_frames` above carries the identical Spark plumbing
    (mapInPandas fan-out per asset)."""
    if width <= 0 or height <= 0:
        raise ValueError("non-positive resize dimensions")
    img = decode_image(blob)
    h, w, ch = img.shape
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    out = img[ys][:, xs]
    if ch == 1:
        out = np.repeat(out, 3, axis=2)
    elif ch == 4:
        out = out[:, :, :3]  # drop alpha: PPM is RGB
    return encode_ppm(out)


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH frames AS (
  SELECT doc_id, f.f AS frame_no,
         substr(text, f.f * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS frame
  FROM documents
  CROSS JOIN LATERAL (
    SELECT unnest(range(0, CAST(ceil(LENGTH(text) / {FRAME_BYTES}.0) AS INT),
                  {FRAME_STRIDE})) AS f
  ) f
)
SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
       CAST(LENGTH(frame) AS INT) AS frame_bytes,
       md5(frame) AS frame_md5
FROM frames
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over multimodal blobs, oracle-checked: the
    Arrow fan-out must produce exactly the frames the SQL slicing
    produces (ASCII payloads ⇒ byte slicing == char slicing)."""
    return sample_frames(multimodal_assets(spark, sf_dir))


# -- real image decode: netpbm P6 (PPM), pure numpy ---------------------------

PPM_W = PPM_H = 16
_PPM_PIXELS = PPM_W * PPM_H * 3  # 768 payload bytes per image
_PPM_HEADER = f"P6\n{PPM_W} {PPM_H}\n255\n"


def encode_ppm(pixels: "np.ndarray") -> bytes:
    """Binary PPM (P6) encoder: 8-bit RGB, the netpbm wire format."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm needs uint8 HxWx3 pixels")
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(blob: bytes) -> "np.ndarray":
    """REAL image decode — binary PPM (P6) needs no external codec:
    header = magic, width, height, maxval separated by whitespace, then
    raw RGB bytes. Spec-legal `#` comment lines between header tokens
    (GIMP/ImageMagick write them) are honored. PNG is handled for real
    by :func:`decode_png` (stdlib zlib) and baseline JPEG by
    `jpeg_codec.decode_jpeg` — every image format here is a real
    decoder."""
    if blob[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize the header: whitespace-separated fields, # starts a
    # comment running to end-of-line; exactly one whitespace byte
    # follows the maxval before pixel data
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3 and pos < len(blob):
        c = blob[pos : pos + 1]
        if c == b"#":
            nl = blob.find(b"\n", pos)
            if nl < 0:
                break
            pos = nl + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while end < len(blob) and blob[end : end + 1].isdigit():
                end += 1
            tokens.append(int(blob[pos:end]))
            pos = end
        else:
            raise ValueError("not a binary PPM (P6) payload")
    if len(tokens) < 3 or pos >= len(blob) or not blob[pos : pos + 1].isspace():
        raise ValueError("not a binary PPM (P6) payload")
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        raise ValueError("non-positive PPM dimensions")
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    if len(blob) - pos < need:
        raise ValueError("truncated PPM payload")
    pixels = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    return pixels.reshape(h, w, 3)


def multimodal_ppm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic VALID PPM image per document: the first 768 ASCII
    bytes of the text (space-padded) become the 16x16 RGB payload — so
    the decoded pixels are byte-predictable and the decode+resize
    pipeline is DuckDB-oracle-checkable end to end."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    payload = F.encode(F.rpad(F.substring("text", 1, _PPM_PIXELS), _PPM_PIXELS, " "), "UTF-8")
    return docs.select(
        "doc_id",
        F.concat(F.encode(F.lit(_PPM_HEADER), "UTF-8"), payload).alias("blob"),
    )


@query(
    "multimodal_image_decode",
    oracle=f"""
WITH padded AS (
  SELECT doc_id, rpad(substr(text, 1, {_PPM_PIXELS}), {_PPM_PIXELS}, ' ') AS s
  FROM documents
), px AS (
  SELECT doc_id,
         ord(substr(s, i, 1)) AS b,
         (i - 1) % 3 AS ch,
         ((i - 1) // 3) // {PPM_W} AS r,
         ((i - 1) // 3) % {PPM_W} AS c
  FROM padded, generate_series(1, {_PPM_PIXELS}) t(i)
)
SELECT doc_id,
       CAST({PPM_W} AS INT) AS width,
       CAST({PPM_H} AS INT) AS height,
       CAST(SUM(CASE WHEN ch = 0 THEN b ELSE 0 END) // {PPM_W * PPM_H} AS BIGINT) AS mean_r,
       CAST(SUM(CASE WHEN ch = 1 THEN b ELSE 0 END) // {PPM_W * PPM_H} AS BIGINT) AS mean_g,
       CAST(SUM(CASE WHEN ch = 2 THEN b ELSE 0 END) // {PPM_W * PPM_H} AS BIGINT) AS mean_b,
       CAST(SUM(CASE WHEN r % 2 = 0 AND c % 2 = 0 THEN b ELSE 0 END) AS BIGINT) AS thumb_byte_sum
FROM px
GROUP BY doc_id
""",
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + resize over a real image format: every doc carries a
    valid 16x16 binary PPM; the Arrow stage parses the netpbm header,
    reshapes the RGB payload, computes floored per-channel means, and
    takes a 2x nearest-neighbor thumbnail (stride-2 slice — the actual
    resize kernel) whose byte sum is emitted. The DuckDB oracle
    recomputes all of it from raw byte arithmetic over the same ASCII
    payload — equal hashes prove the decoder and the resize read exactly
    the bytes they claim. (PNG and baseline JPEG are decoded for real
    too — see `multimodal_png_decode` / `multimodal_jpeg_decode`; the
    pipeline shape is identical across all three.)

    Plan shape: narrow map end-to-end — blob synthesis is JVM concat,
    decode+thumbnail run in one Arrow batch stage, the only shuffle is
    the final nothing (per-doc rows come straight out of the map)."""
    assets = multimodal_ppm_assets(spark, sf_dir)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_ppm(bytes(blob))
                h, w, _ = img.shape
                thumb = img[::2, ::2, :]  # nearest-neighbor 2x downsample
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(w),
                        "height": int(h),
                        "mean_r": int(sums[0]) // (w * h),
                        "mean_g": int(sums[1]) // (w * h),
                        "mean_b": int(sums[2]) // (w * h),
                        "thumb_byte_sum": int(thumb.sum(dtype=np.int64)),
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        feats,
        schema=(
            "doc_id BIGINT, width INT, height INT, mean_r BIGINT, "
            "mean_g BIGINT, mean_b BIGINT, thumb_byte_sum BIGINT"
        ),
    )


# -- real audio decode: RIFF/WAVE PCM16, pure struct+numpy --------------------

WAV_RATE = 16000
_WAV_SAMPLES = 256
_WAV_DATA_BYTES = _WAV_SAMPLES * 2


def encode_wav_pcm16(samples: "np.ndarray", rate: int = WAV_RATE) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + little-endian PCM16 mono."""
    import struct

    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(blob: bytes) -> tuple[int, "np.ndarray"]:
    """REAL audio decode — RIFF/WAVE PCM needs no external codec: walk
    the chunk list, validate the fmt chunk (PCM, 16-bit, mono), return
    (sample_rate, int16 samples). Compressed audio (mp3/aac/opus) stays
    honestly stubbed like JPEG/PNG — those need codec libraries."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, rate, samples = 12, None, None
    while off + 8 <= len(blob):
        cid, clen = blob[off : off + 4], struct.unpack_from("<I", blob, off + 4)[0]
        body = blob[off + 8 : off + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated WAVE chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAVE missing fmt or data chunk")
    return rate, samples


def multimodal_wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic VALID WAV per document: the first 512 ASCII bytes of
    the text (space-padded) become 256 little-endian PCM16 samples, so
    decoded sample values are byte-predictable and oracle-checkable."""
    # derive the 44-byte canonical header from the roundtrip-tested
    # encoder so the two layouts can never diverge
    header = encode_wav_pcm16(np.zeros(_WAV_SAMPLES, dtype=np.int16))[:44]
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    payload = F.encode(
        F.rpad(F.substring("text", 1, _WAV_DATA_BYTES), _WAV_DATA_BYTES, " "),
        "UTF-8",
    )
    return docs.select(
        "doc_id", F.concat(F.lit(header), payload).alias("blob")
    )


@query(
    "multimodal_audio_decode",
    oracle=f"""
WITH padded AS (
  SELECT doc_id, rpad(substr(text, 1, {_WAV_DATA_BYTES}), {_WAV_DATA_BYTES}, ' ') AS s
  FROM documents
), smp AS (
  SELECT doc_id, i,
         ord(substr(s, 2*i - 1, 1)) + 256 * ord(substr(s, 2*i, 1)) AS u
  FROM padded, generate_series(1, {_WAV_SAMPLES}) t(i)
), sgn AS (
  SELECT doc_id, i, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM smp
)
SELECT doc_id,
       CAST({_WAV_SAMPLES} AS INT) AS n_samples,
       CAST({WAV_RATE} AS INT) AS sample_rate,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
       CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum,
       CAST(SUM(CASE WHEN (i - 1) % 4 = 0 THEN v ELSE 0 END) AS BIGINT) AS stride4_sum
FROM sgn
GROUP BY doc_id
""",
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + resample over a real audio container: every doc
    carries a valid RIFF/WAVE PCM16 blob; the Arrow stage walks the
    chunk list with a real parser, reads int16 samples, and emits peak,
    absolute sum, and a stride-4 decimation sum (the nearest-neighbor
    resample kernel). The DuckDB oracle recomputes everything from
    little-endian byte arithmetic over the same payload — the audio
    analog of `multimodal_image_decode`, same plan shape (narrow map,
    one Arrow stage, no shuffle before the per-doc rows)."""
    assets = multimodal_wav_assets(spark, sf_dir)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                rate, samples = decode_wav_pcm16(bytes(blob))
                s64 = samples.astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": int(samples.size),
                        "sample_rate": int(rate),
                        "peak_abs": int(np.abs(s64).max()),
                        "abs_sum": int(np.abs(s64).sum()),
                        "stride4_sum": int(s64[::4].sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        feats,
        schema=(
            "doc_id BIGINT, n_samples INT, sample_rate INT, "
            "peak_abs BIGINT, abs_sum BIGINT, stride4_sum BIGINT"
        ),
    )


# -- real video container: YUV4MPEG2 (y4m), pure parsing ----------------------

Y4M_W = Y4M_H = 8
_Y4M_FRAME_BYTES = Y4M_W * Y4M_H * 3  # C444: full-res Y, U, V planes
Y4M_FRAMES = 3
Y4M_STRIDE = 2  # keep frames 0, 2 — the temporal sampler
_Y4M_HEADER = f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C444\n"
_Y4M_DATA_CHARS = Y4M_FRAMES * _Y4M_FRAME_BYTES


def encode_y4m(frames: "list[np.ndarray]", w: int = Y4M_W, h: int = Y4M_H) -> bytes:
    """YUV4MPEG2 stream: ASCII header, then FRAME-delimited raw C444
    planes — the uncompressed interchange format ffmpeg reads/writes."""
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode())
    for f in frames:
        if f.dtype != np.uint8 or f.size != w * h * 3:
            raise ValueError("encode_y4m needs uint8 frames of w*h*3 bytes")
        out += b"FRAME\n" + f.tobytes()
    return bytes(out)


def decode_y4m(blob: bytes) -> tuple[int, int, "list[np.ndarray]"]:
    """REAL container parse — y4m needs no codec: read the parameter
    line (W/H/C tags), then split FRAME sections of W*H*3 bytes (C444).
    Compressed video (h264/vp9) stays honestly stubbed: those need
    real codecs."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = "C420"
    for tag in blob[:nl].split(b" ")[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            colorspace = tag.decode()
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if w <= 0 or h <= 0:
        raise ValueError("non-positive y4m dimensions")
    if colorspace != "C444":
        raise ValueError("only C444 supported")
    frame_bytes = w * h * 3
    frames = []
    off = nl + 1
    while off < len(blob):
        fnl = blob.find(b"\n", off)
        if fnl < 0 or blob[off:off + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        body = blob[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError("truncated y4m frame")
        frames.append(np.frombuffer(body, dtype=np.uint8))
        off = fnl + 1 + frame_bytes
    return w, h, frames


def multimodal_y4m_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic VALID y4m clip per document: 3 C444 frames of 8x8,
    planes filled from consecutive ASCII text slices (space-padded) —
    frame contents are byte-predictable, so the container parse and the
    temporal sampler are oracle-checkable."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    padded = F.rpad(F.substring("text", 1, _Y4M_DATA_CHARS), _Y4M_DATA_CHARS, " ")
    pieces = [F.encode(F.lit(_Y4M_HEADER), "UTF-8")]
    for i in range(Y4M_FRAMES):
        pieces.append(F.encode(F.lit("FRAME\n"), "UTF-8"))
        pieces.append(
            F.encode(
                F.substring(padded, i * _Y4M_FRAME_BYTES + 1, _Y4M_FRAME_BYTES),
                "UTF-8",
            )
        )
    return docs.select("doc_id", F.concat(*pieces).alias("blob"))


@query(
    "multimodal_video_frames",
    oracle=f"""
WITH padded AS (
  SELECT doc_id, rpad(substr(text, 1, {_Y4M_DATA_CHARS}), {_Y4M_DATA_CHARS}, ' ') AS s
  FROM documents
), px AS (
  SELECT doc_id,
         (i - 1) // {_Y4M_FRAME_BYTES} AS frame_no,
         (i - 1) % {_Y4M_FRAME_BYTES} AS p,
         ord(substr(s, i, 1)) AS b
  FROM padded, generate_series(1, {_Y4M_DATA_CHARS}) t(i)
)
SELECT doc_id,
       CAST(frame_no AS INT) AS frame_no,
       CAST({Y4M_W} AS INT) AS width,
       CAST({Y4M_H} AS INT) AS height,
       CAST(SUM(b) AS BIGINT) AS frame_byte_sum,
       CAST(SUM(CASE WHEN p < {Y4M_W * Y4M_H} THEN b ELSE 0 END) AS BIGINT) AS y_plane_sum
FROM px
WHERE frame_no % {Y4M_STRIDE} = 0
GROUP BY doc_id, frame_no
""",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container frame sampling: each doc carries a valid
    3-frame YUV4MPEG2 clip; the Arrow stage parses the header and FRAME
    markers with a real parser, keeps every {Y4M_STRIDE}nd frame (the
    temporal sampler of a training-data video pipeline), and emits
    per-frame byte and Y-plane sums — all recomputed by the DuckDB
    oracle from position arithmetic over the same payload. One input
    row fans out to the kept frames inside the Arrow batch, the exact
    shape a real ffmpeg-backed sampler has (decode of COMPRESSED video
    stays honestly stubbed — codecs absent here)."""
    assets = multimodal_y4m_assets(spark, sf_dir)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, fr = decode_y4m(bytes(blob))
                for f_no in range(0, len(fr), Y4M_STRIDE):
                    frame = fr[f_no].astype(np.int64)
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_no": f_no,
                            "width": w,
                            "height": h,
                            "frame_byte_sum": int(frame.sum()),
                            "y_plane_sum": int(frame[: w * h].sum()),
                        }
                    )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        frames,
        schema=(
            "doc_id BIGINT, frame_no INT, width INT, height INT, "
            "frame_byte_sum BIGINT, y_plane_sum BIGINT"
        ),
    )


# -- real PNG decode: stdlib zlib + numpy unfiltering -------------------------
#
# PNG (ISO/IEC 15948) needs no external codec for the baseline profile:
# chunked container + zlib-deflated scanlines, each prefixed by one of
# five filter bytes (None/Sub/Up/Average/Paeth). Both directions are
# implemented here from the public spec; reference provenance: the
# tiered-storage reference has no media path at all — this family exists
# for the LLM-pipeline brief (decode as an Arrow-batched narrow map).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit only)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: "np.ndarray", filters: "list[int] | None" = None) -> bytes:
    """Baseline PNG encoder: 8-bit gray/RGB/RGBA, one IDAT, per-row
    filter types (default cycles 0..4 so a decode of any image >=5 rows
    exercises every unfilter kernel)."""
    import struct
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None or pixels.dtype != np.uint8:
        raise ValueError("encode_png needs uint8 HxW[x{1,3,4}] pixels")
    if filters is None:
        filters = [r % 5 for r in range(h)]
    bpp = ch
    raw = pixels.reshape(h, w * ch).astype(np.int16)
    zero = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for r in range(h):
        ft = filters[r]
        cur, prior = raw[r], (raw[r - 1] if r else zero)
        if ft == 0:
            filt = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - left
        elif ft == 2:
            filt = cur - prior
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - (left + prior) // 2
        elif ft == 4:
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
            # vectorized Paeth predictor (encoder side uses RAW
            # neighbors, so no sequential dependency)
            pp = left + prior - ul
            pa = np.abs(pp - left)
            pb = np.abs(pp - prior)
            pc = np.abs(pp - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            ).astype(np.int16)
            filt = cur - pred
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> "np.ndarray":
    """REAL PNG decode, stdlib-only: signature + chunk walk with CRC
    verification, IHDR validation (8-bit, color type 0/2/6, no Adam7
    interlace), IDAT concatenation, zlib inflate, and the five scanline
    unfilters (None/Sub/Up/Average/Paeth) reconstructed per the spec.
    Returns uint8 HxWxC pixels. Raises ValueError on anything malformed
    — this is the error surface the fuzz tests drive."""
    import struct
    import zlib

    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(blob):
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if ihdr is None and tag != b"IHDR":
            raise ValueError("PNG: first chunk is not IHDR")
        if tag == b"IHDR":
            if length != 13:
                raise ValueError("PNG IHDR wrong length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or not seen_iend:
        raise ValueError("PNG missing IHDR or IEND")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if w <= 0 or h <= 0:
        raise ValueError("non-positive PNG dimensions")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt_method != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    bpp = ch
    recon = np.zeros((h, stride), dtype=np.uint8)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    for r in range(h):
        ft = int(arr[r, 0])
        line = arr[r, 1:].astype(np.int32)
        prior = recon[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prior) % 256
        elif ft == 1:
            # Sub unfilter vectorized: within a channel, recon is the
            # running sum of filtered bytes (mod 256) — one cumsum per
            # channel instead of a per-byte Python loop
            rec = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.int64) % 256
            ).reshape(-1)
        elif ft in (3, 4):
            # Average/Paeth depend on RECONSTRUCTED left neighbors —
            # inherently sequential; plain-list indexing is ~10x numpy
            # scalar indexing here, and the Paeth predictor is inlined
            # (a per-byte function call + three abs() calls measured as
            # half the decode profile)
            ln, pr = line.tolist(), prior.tolist()
            out_row = [0] * stride
            if ft == 3:
                for x in range(stride):
                    left = out_row[x - bpp] if x >= bpp else 0
                    out_row[x] = (ln[x] + ((left + pr[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    left = out_row[x - bpp] if x >= bpp else 0
                    up = pr[x]
                    ul = pr[x - bpp] if x >= bpp else 0
                    pa = up - ul
                    pb = left - ul
                    if pa < 0:
                        pa = -pa
                    if pb < 0:
                        pb = -pb
                    pc = pa + pb if (up >= ul) == (left >= ul) else (
                        pa - pb if pa > pb else pb - pa
                    )
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul)
                    )
                    out_row[x] = (ln[x] + pred) & 255
            rec = np.array(out_row, dtype=np.int32)
        else:
            raise ValueError(f"invalid PNG filter type {ft} on row {r}")
        recon[r] = rec.astype(np.uint8)
    return recon.reshape(h, w, ch)


def multimodal_png_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc pixel payload for the PNG pipeline: the same deterministic
    16x16 RGB pixels as the PPM family (first 768 ASCII bytes of the
    text, space-padded) — the PNG container is built in the Arrow stage
    because deflate is not a JVM-expression; the pixels themselves stay
    oracle-predictable byte arithmetic."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    payload = F.encode(
        F.rpad(F.substring("text", 1, _PPM_PIXELS), _PPM_PIXELS, " "), "UTF-8"
    )
    return docs.select("doc_id", payload.alias("pixel_bytes"))


@query(
    "multimodal_png_decode",
    oracle=f"""
WITH padded AS (
  SELECT doc_id, rpad(substr(text, 1, {_PPM_PIXELS}), {_PPM_PIXELS}, ' ') AS s
  FROM documents
), px AS (
  SELECT doc_id,
         ord(substr(s, i, 1)) AS b,
         (i - 1) % 3 AS ch,
         ((i - 1) // 3) // {PPM_W} AS r,
         ((i - 1) // 3) % {PPM_W} AS c
  FROM padded, generate_series(1, {_PPM_PIXELS}) t(i)
)
SELECT doc_id,
       CAST({PPM_W} AS INT) AS width,
       CAST({PPM_H} AS INT) AS height,
       CAST(SUM(CASE WHEN ch = 0 THEN b ELSE 0 END) // {PPM_W * PPM_H} AS BIGINT) AS mean_r,
       CAST(SUM(CASE WHEN ch = 1 THEN b ELSE 0 END) // {PPM_W * PPM_H} AS BIGINT) AS mean_g,
       CAST(SUM(CASE WHEN ch = 2 THEN b ELSE 0 END) // {PPM_W * PPM_H} AS BIGINT) AS mean_b,
       CAST(SUM(CASE WHEN r % 2 = 1 AND c % 2 = 1 THEN b ELSE 0 END) AS BIGINT) AS thumb_byte_sum
FROM px
GROUP BY doc_id
""",
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode: every doc's deterministic 16x16 RGB pixels are
    containerized as a baseline PNG (zlib deflate, per-row filters
    cycling None/Sub/Up/Average/Paeth so all five unfilter kernels run
    on every image) and decoded back by :func:`decode_png` — chunk CRCs,
    IHDR validation, inflate, and spec unfiltering all on the hot path.
    Features are floored channel means plus an odd-stride 2x thumbnail
    byte sum (offset [1::2] so this query's hash cannot collide with the
    PPM family's even-stride thumbnail). The DuckDB oracle recomputes
    everything from raw byte arithmetic over the same ASCII payload —
    a green hash proves the inflate+unfilter path reconstructs exactly
    the bytes that went in.

    Plan shape: narrow map end-to-end — pixel synthesis is JVM
    rpad/encode, the encode+decode round-trip and feature math run in
    one Arrow batch stage, no shuffle at any point (plan-gated)."""
    assets = multimodal_png_assets(spark, sf_dir)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["pixel_bytes"]):
                pixels = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(
                    PPM_H, PPM_W, 3
                )
                img = decode_png(encode_png(pixels))
                if img.shape != (PPM_H, PPM_W, 3):
                    raise ValueError("PNG round-trip shape mismatch")
                h, w, _ = img.shape
                thumb = img[1::2, 1::2, :]
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(w),
                        "height": int(h),
                        "mean_r": int(sums[0]) // (w * h),
                        "mean_g": int(sums[1]) // (w * h),
                        "mean_b": int(sums[2]) // (w * h),
                        "thumb_byte_sum": int(thumb.sum(dtype=np.int64)),
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        feats,
        schema=(
            "doc_id BIGINT, width INT, height INT, mean_r BIGINT, "
            "mean_g BIGINT, mean_b BIGINT, thumb_byte_sum BIGINT"
        ),
    )


# -- real JPEG decode: baseline JFIF codec, pure numpy ------------------------

JPEG_QUALITY = 92  # scaled luma q00 = 3 (odd: no rounding ties, see codec)


def _jpeg_q00() -> int:
    from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
        QUANT_LUMA,
        scale_quant_table,
    )

    return int(scale_quant_table(QUANT_LUMA, JPEG_QUALITY)[0, 0])


def _jpeg_block_sql(b: str, q00: int) -> str:
    """DuckDB twin of the baseline JPEG DC path for a constant 8x8 block
    of value ``b``: quantized DC d = floor(8(b-128)/q + 0.5), decoded
    value = clamp(floor(d*q/8 + 0.5) + 128). Exact because a constant
    block's AC coefficients quantize to zero and the decoder's DC-only
    fast path is integer arithmetic (jpeg_codec._idct_block)."""
    d = f"FLOOR((8*({b}-128))/{q00}.0 + 0.5)"
    return (
        f"CAST(LEAST(255, GREATEST(0, "
        f"CAST(FLOOR(({d})*{q00}/8.0 + 0.5) AS INT) + 128)) AS INT)"
    )


def multimodal_jpeg_pixel_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four deterministic block values per doc: the first 4 ASCII bytes
    of the text (space-padded) each fill one constant 8x8 block of a
    16x16 grayscale image — the piecewise-constant fixture that makes a
    LOSSY codec oracle-checkable (constant blocks survive DCT+quant
    exactly, see jpeg_codec docstring)."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id",
        F.encode(F.rpad(F.substring("text", 1, 4), 4, " "), "UTF-8").alias(
            "block_bytes"
        ),
    )


def _jpeg_oracle() -> str:
    q00 = _jpeg_q00()
    cells = ", ".join(
        f"{_jpeg_block_sql(f'ord(substr(s, {k + 1}, 1))', q00)} AS b{k // 2}{k % 2}"
        for k in range(4)
    )
    return f"""
WITH padded AS (
  SELECT doc_id, rpad(substr(text, 1, 4), 4, ' ') AS s FROM documents
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(16 AS INT) AS height,
       {cells}
FROM padded
"""


@query("multimodal_jpeg_decode", oracle=_jpeg_oracle())
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode — the last image format de-stubbed: every doc's
    four deterministic block values become a 16x16 grayscale baseline
    JFIF (full encoder: DCT, Annex K quality-scaled quantization,
    differential-DC + run-length-AC Huffman coding, byte stuffing) and
    are decoded back by `jpeg_codec.decode_jpeg` — marker parse, Huffman
    decode with unstuffing, dequantize, IDCT — on the hot path. The
    fixture is piecewise-constant 8x8 blocks, the one input family a
    LOSSY codec decodes to SQL-predictable bytes: constant blocks have
    zero AC energy, so the whole round-trip reduces to the exact integer
    DC formula the oracle replays (floor-half-up quantize + the
    decoder's libjpeg-style DC-only fast path). A green hash proves the
    entropy coder, the coefficient pipeline, and the DC reconstruction
    compute exactly what T.81 says for these streams; general blocks
    (gradients, color, noise) are covered by the codec's pytest
    round-trips.

    Plan shape: narrow map end-to-end — fixture synthesis is JVM
    rpad/encode, encode+decode run in one Arrow stage, no shuffle
    (plan-gated)."""
    from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    assets = multimodal_jpeg_pixel_bytes(spark, sf_dir)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # dedup-before-decode (guide §8 / the text pipeline's exact
            # dedup discipline): the decoded corners are a pure function
            # of the 4 payload bytes, so identical payloads in a batch
            # round-trip through the codec once; per-doc outputs are
            # unchanged (verified bit-for-bit against the per-row form)
            memo: dict[bytes, tuple] = {}
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["block_bytes"]):
                key = bytes(payload)
                corners = memo.get(key)
                if corners is None:
                    vals = list(key)
                    px = np.zeros((16, 16), dtype=np.uint8)
                    px[:8, :8], px[:8, 8:] = vals[0], vals[1]
                    px[8:, :8], px[8:, 8:] = vals[2], vals[3]
                    img = decode_jpeg(encode_jpeg(px, quality=JPEG_QUALITY))
                    if img.shape != (16, 16, 1):
                        raise ValueError("JPEG round-trip shape mismatch")
                    corners = (
                        int(img[0, 0, 0]),
                        int(img[0, 8, 0]),
                        int(img[8, 0, 0]),
                        int(img[8, 8, 0]),
                    )
                    memo[key] = corners
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": 16,
                        "height": 16,
                        "b00": corners[0],
                        "b01": corners[1],
                        "b10": corners[2],
                        "b11": corners[3],
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        feats,
        schema=(
            "doc_id BIGINT, width INT, height INT, "
            "b00 INT, b01 INT, b10 INT, b11 INT"
        ),
    )


def _jpeg420_oracle() -> str:
    q00 = _jpeg_q00()
    cells = ", ".join(
        f"{_jpeg_block_sql(f'ord(substr(s, {k + 1}, 1))', q00)} AS t{k // 2}{k % 2}"
        for k in range(4)
    )
    return f"""
WITH padded AS (
  SELECT doc_id, rpad(substr(text, 1, 4), 4, ' ') AS s FROM documents
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(16 AS INT) AS height,
       {cells}
FROM padded
"""


@query("multimodal_jpeg420_decode", oracle=_jpeg420_oracle())
def multimodal_jpeg420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 chroma-subsampled JPEG decode on the hot path — the
    dominant real-corpus layout (2x2 luma MCUs + box-averaged chroma,
    T.81 A.2.3). Each doc's four byte values become a 16x16 COLOR image
    of four constant 8x8 GRAY tiles (R=G=B=v) — exactly one 4:2:0 MCU
    (4 luma + 1 Cb + 1 Cr blocks), so per-doc decode cost matches the
    4:4:4 fixture. Gray content makes the
    lossy 4:2:0 round-trip oracle-exact: Y=v and Cb=Cr=128 exactly under
    the T.871 matrix, the 2x2 chroma box average of a constant 128 plane
    is 128, its level-shifted DC quantizes to exactly 0, so the decoded
    chroma is exactly 128 and every RGB channel reduces to the SAME
    integer luma-DC formula the 4:4:4 fixture uses. The UDF additionally
    asserts all three decoded channels agree on every tile corner — a
    wrong chroma path (bad MCU interleave, bad upsample, bad un-
    subsampled reconstruction) breaks that equality and errors the
    query, so a green hash certifies the full 4:2:0 pipeline, not just
    luma. General 4:2:0 content (gradients, noise, color) is covered by
    the codec pytest round-trips.

    Plan shape: narrow map end-to-end, no shuffle (plan-gated)."""
    from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    assets = multimodal_jpeg_pixel_bytes(spark, sf_dir)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # dedup-before-decode: tiles (and the gray-neutrality check)
            # are a pure function of the 4 payload bytes — decode each
            # distinct payload once per batch, outputs per doc unchanged
            memo: dict[bytes, list] = {}
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["block_bytes"]):
                key = bytes(payload)
                tiles = memo.get(key)
                if tiles is None:
                    vals = list(key)
                    px = np.zeros((16, 16, 3), dtype=np.uint8)
                    px[:8, :8] = vals[0]
                    px[:8, 8:] = vals[1]
                    px[8:, :8] = vals[2]
                    px[8:, 8:] = vals[3]
                    img = decode_jpeg(
                        encode_jpeg(px, quality=JPEG_QUALITY, subsampling="420")
                    )
                    if img.shape != (16, 16, 3):
                        raise ValueError("JPEG 4:2:0 round-trip shape mismatch")
                    corners = [(0, 0), (0, 8), (8, 0), (8, 8)]
                    tiles = []
                    for y, x in corners:
                        rgb = img[y, x, :]
                        if not (rgb[0] == rgb[1] == rgb[2]):
                            raise ValueError(
                                "4:2:0 chroma path broke gray neutrality: "
                                f"{rgb.tolist()}"
                            )
                        tiles.append(int(rgb[0]))
                    memo[key] = tiles
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": 16,
                        "height": 16,
                        "t00": tiles[0],
                        "t01": tiles[1],
                        "t10": tiles[2],
                        "t11": tiles[3],
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        feats,
        schema=(
            "doc_id BIGINT, width INT, height INT, "
            "t00 INT, t01 INT, t10 INT, t11 INT"
        ),
    )


def _jpeg_progressive_oracle() -> str:
    q00 = _jpeg_q00()
    cells = ", ".join(
        f"{_jpeg_block_sql(f'ord(substr(s, {k + 1}, 1))', q00)} AS b{k // 2}{k % 2}"
        for k in range(4)
    )
    return f"""
WITH padded AS (
  SELECT doc_id, rpad(substr(text, 1, 4), 4, ' ') AS s FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'progressive' ELSE 'baseline' END
           AS process,
       {cells}
FROM padded
"""


@query("multimodal_jpeg_progressive_decode", oracle=_jpeg_progressive_oracle())
def multimodal_jpeg_progressive_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Progressive (SOF2) JPEG decode WITH process routing — real web
    corpora are majority progressive, so the decode operator must
    route by coding process instead of rejecting most inputs. Each
    doc's four byte values become the 16x16 grayscale fixture; even
    doc_ids are encoded PROGRESSIVE (the Annex G multi-scan script:
    spectral selection + successive approximation,
    `jpeg_progressive.py`), odd ones baseline. The UDF sniffs the
    process marker-only (`jpeg_process`), asserts it matches the
    encoder used, and decodes through the shared `decode_jpeg` router.
    The oracle replays the same integer DC formula for BOTH halves —
    the progressive script refines every bit plane to 0, so its
    decoded bytes are bit-identical to baseline — plus the routed
    process label per doc. A green hash certifies the SOF2 scan
    reassembly (DC first/refine, AC first with EOB runs, the AC
    correction-bit procedure) lands on exactly the T.81 values;
    general content is covered by the codec pytest round-trips.

    Plan shape: narrow map end-to-end, no shuffle (plan-gated)."""
    from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive,
        jpeg_process,
    )

    assets = multimodal_jpeg_pixel_bytes(spark, sf_dir)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # dedup-before-decode, keyed (payload, process): the routed
            # label, router assertion, and decoded corners are a pure
            # function of the payload bytes and the encoding process —
            # each distinct pair round-trips once per batch
            memo: dict[tuple, tuple] = {}
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["block_bytes"]):
                progressive = int(doc_id) % 2 == 0
                key = (bytes(payload), progressive)
                hit = memo.get(key)
                if hit is None:
                    vals = list(key[0])
                    px = np.zeros((16, 16), dtype=np.uint8)
                    px[:8, :8], px[:8, 8:] = vals[0], vals[1]
                    px[8:, :8], px[8:, 8:] = vals[2], vals[3]
                    if progressive:
                        blob = encode_jpeg_progressive(px, quality=JPEG_QUALITY)
                    else:
                        blob = encode_jpeg(px, quality=JPEG_QUALITY)
                    process = jpeg_process(blob)
                    if process != (
                        "progressive" if progressive else "baseline"
                    ):
                        raise ValueError(
                            f"router misclassified doc {doc_id}: {process}"
                        )
                    img = decode_jpeg(blob)
                    if img.shape != (16, 16, 1):
                        raise ValueError("JPEG round-trip shape mismatch")
                    hit = (
                        process,
                        int(img[0, 0, 0]),
                        int(img[0, 8, 0]),
                        int(img[8, 0, 0]),
                        int(img[8, 8, 0]),
                    )
                    memo[key] = hit
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "process": hit[0],
                        "b00": hit[1],
                        "b01": hit[2],
                        "b10": hit[3],
                        "b11": hit[4],
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        feats,
        schema=(
            "doc_id BIGINT, process STRING, "
            "b00 INT, b01 INT, b10 INT, b11 INT"
        ),
    )
