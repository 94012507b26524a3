"""Multimodal column support: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: payloads live in a
``BinaryType`` column (or object-store URIs for > ~100 MB blobs) next
to a typed metadata struct; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each Python worker sees a bounded
pandas batch, never one row at a time.

Kernel status: PNG image decode and PCM-WAV audio decode are REAL
since round 7 (sources/pnglite.py — stdlib zlib + the spec's five
scanline filters; sources/wavlite.py — RIFF/PCM has no codec at all;
both spec-pinned; ``decode_image``, ``png_stats_features`` and
``wav_stats_features`` run them), so image and audio stats come from
actual decoded samples. JPEG/WebP/MP3/video codecs still need
libraries absent from this container and stay loud
NotImplementedError / clearly-marked deterministic fakes — the
Spark-side plumbing (schema, batch iteration, partition sizing) is
real and tested in tests/test_operators.py either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("mime", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def read_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a directory of files as (path, modificationTime, length,
    content BINARY) — Spark's built-in binaryFile source."""
    return spark.read.format("binaryFile").load(path)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an H×W×C uint8 numpy array.

    PNG decodes FOR REAL since round 7 — the format needs only
    stdlib zlib + the spec's five scanline filters, both implemented
    in sources/pnglite.py (spec-pinned against hand-authored filter
    vectors, the lz4lite playbook). Other codecs (JPEG, WebP, …)
    still require libraries absent from this container and stay
    loudly NotImplemented."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from zappy_spark.sources.pnglite import decode_png

        img, _ = decode_png(bytes(payload))
        return img
    if payload[:2] == b"BM":
        from zappy_spark.sources.bmplite import decode_bmp

        img, _ = decode_bmp(bytes(payload))
        return img
    if payload[:4] == b"GIF8":
        from zappy_spark.sources.giflite import decode_gif

        img, _ = decode_gif(bytes(payload))
        return img
    if payload[:1] == b"P" and payload[1:2] in b"123456":
        from zappy_spark.sources.pnmlite import decode_pnm

        img, _ = decode_pnm(bytes(payload))
        return img
    raise NotImplementedError(
        "image decode stub for compressed formats (JPEG/WebP/…): "
        "install a codec (e.g. pillow); PNG, BMP, GIF and "
        "PBM/PGM/PPM decode natively via sources/{png,bmp,gif,pnm}lite"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' of a payload: byte histogram
    folded to `dim` buckets — stands in for a real encoder so the
    pipeline shape (binary → fixed-dim float vector) is testable."""
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in buckets]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """binary payload → fixed-dim feature vector via mapInPandas.

    Arrow-batched: each call receives a pandas DataFrame of
    spark.sql.execution.arrow.maxRecordsPerBatch rows; payload bytes
    stay off the driver. Output schema is declared up front
    (FEATURE_SCHEMA) so downstream plans are fully typed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(bytes(p), dim)
                    ),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def _fake_resize(payload: bytes, h: int, w: int, channels: int) -> bytes:
    """Deterministic fake resize kernel: an h*w*channels pixel buffer
    derived from md5(payload) — stands in for decode→resize→encode so
    the batch shape and output contract (exact buffer length, typed
    dims) are testable without a codec library."""
    import hashlib

    seed = hashlib.md5(payload).digest()
    need = h * w * channels
    return (seed * (need // len(seed) + 1))[:need]


def resize_images(
    df: DataFrame, height: int, width: int, channels: int = 3
) -> DataFrame:
    """binary image payload → fixed-size pixel buffer via mapInPandas.

    The kind filter runs BEFORE the Python stage, so non-image rows
    never cross the Arrow boundary; output carries the new dims as
    typed columns (the downstream contract for training loaders: every
    payload is exactly height*width*channels bytes). The kernel is the
    deterministic fake (_fake_resize) — swap in decode_image + a real
    resampler when a codec library is available."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(
                        lambda p: _fake_resize(bytes(p), height, width, channels)
                    ),
                    "width": pd.Series([width] * n, dtype="int32"),
                    "height": pd.Series([height] * n, dtype="int32"),
                    "channels": pd.Series([channels] * n, dtype="int32"),
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expand (media_id, n_frames) to
    one row per sampled frame index — pure Spark (sequence+explode);
    the actual frame decode would slot into extract_features."""
    return (
        df.filter((F.col("kind") == "video") & (F.col("meta.n_frames") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.n_frames") - 1,
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("start_sample", LongType()),
        StructField("n_samples", LongType()),
    ]
)


def audio_chunk_plan(df: DataFrame, chunk_ms: int = 1000) -> DataFrame:
    """Audio chunking plumbing: expand (media_id, sample_rate,
    n_frames≡n_samples) into one row per fixed-duration chunk with
    exact sample offsets — pure Spark (sequence+explode), the
    payload is never touched. The decode of each chunk slots into a
    mapInPandas kernel exactly like resize_images; the plan keeps
    chunk boundaries deterministic so re-runs resume mid-file.

    The last chunk is truncated to the real sample count (the
    training-loader contract: Σ n_samples == total samples)."""
    spc = (F.col("meta.sample_rate").cast("bigint") * chunk_ms / 1000).cast(
        "bigint"
    )  # samples per chunk
    total = F.col("meta.n_frames").cast("bigint")
    n_chunks = F.ceil(total / spc).cast("int")
    base = df.filter(
        (F.col("kind") == "audio")
        & (F.col("meta.sample_rate") > 0)
        & (F.col("meta.n_frames") > 0)
    ).select(
        "media_id",
        spc.alias("_spc"),
        total.alias("_total"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx").cast("bigint") * F.col("_spc")
    return base.select(
        "media_id",
        "chunk_idx",
        start.alias("start_sample"),
        F.least(F.col("_spc"), F.col("_total") - start).alias("n_samples"),
    )


def _fake_fetch(uri: str) -> bytes:
    """Deterministic fake object-store fetch: payload bytes derived
    from md5(uri). Stands in for an S3/GCS ranged GET so the
    executor-side fetch contract (bytes materialize in the Python
    worker, never on the driver) is testable offline."""
    import hashlib

    seed = hashlib.md5(uri.encode()).digest()
    return (seed * 8)[:128]


def load_uri_payloads(df: DataFrame, uri_col: str = "uri") -> DataFrame:
    """URI-reference decode path for blobs too large to inline
    (> ~100 MB): the table carries object-store URIs; payloads are
    fetched INSIDE mapInPandas on the executors, so blob bytes flow
    straight from the store to the worker that processes them — the
    driver only ever sees the URI strings. Batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch like every other
    multimodal kernel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf[uri_col].map(_fake_fetch),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return df.mapInPandas(batches, schema=schema)


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_sum", LongType()),
    ]
)


def sample_frame_features(
    df: DataFrame, frame_bytes: int = 32, every_n: int = 4
) -> DataFrame:
    """Frame-sampled feature extraction through the payload: treat
    each ``frame_bytes`` slice of the binary payload as one frame,
    decode every ``every_n``-th frame, emit one feature row per
    sampled frame — the video-training-data shape (decode is per
    sampled frame, never the whole clip). The stand-in "decode"
    is an exact integer byte-sum, so results are value-checkable;
    a real codec swaps the kernel, not the plumbing.

    Unlike ``frame_sample_plan`` (which only plans indices), the
    payload here actually VISITS the Python worker — once per media
    row inside an Arrow batch, fanning out to k sampled-frame rows
    (mapInPandas as flatMap). Payloads never touch the driver;
    batch memory is bounded by maxRecordsPerBatch × payload size.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "n_frames": [],
                "frame_len": [],
                "frame_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                nf = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, nf, every_n):
                    chunk = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    out["n_frames"].append(nf)
                    out["frame_len"].append(len(chunk))
                    out["frame_sum"].append(sum(chunk))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "frame_len": pd.Series(out["frame_len"], dtype="int32"),
                    "frame_sum": pd.Series(out["frame_sum"], dtype="int64"),
                }
            )

    return df.mapInPandas(batches, schema=FRAME_FEATURE_SCHEMA)


PNG_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("px_mean", FloatType()),
        StructField("px_std", FloatType()),
    ]
)


def png_stats_features(df: DataFrame) -> DataFrame:
    """REAL image feature extraction over PNG payloads (round 7):
    decode each payload with the pure-Python spec-pinned PNG codec
    (sources/pnglite.py) inside Arrow-batched ``mapInPandas`` and
    emit per-image dimensions + pixel statistics — the first
    multimodal kernel here whose numbers come from actual decoded
    pixels, not a deterministic fake. Non-PNG payloads raise
    loudly (route other codecs through the documented stub).

    Expects (media_id LONG, payload BINARY). Scale shape identical
    to extract_features: payload bytes stay on the executors, each
    worker decodes one bounded Arrow batch at a time."""
    import numpy as np

    from zappy_spark.sources.pnglite import decode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "channels": [],
                "px_mean": [],
                "px_std": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img, meta = decode_png(bytes(payload))
                px = img.astype(np.float64)
                out["media_id"].append(int(mid))
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["channels"].append(meta["channels"])
                out["px_mean"].append(float(px.mean()))
                out["px_std"].append(float(px.std()))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=PNG_STATS_SCHEMA)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("rms", FloatType()),
        StructField("peak", IntegerType()),
    ]
)


def wav_stats_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction over PCM WAV payloads (round 7;
    sources/wavlite.py — RIFF/PCM has no codec, just the container):
    per-clip sample rate, duration, RMS and peak from actual decoded
    samples inside Arrow-batched ``mapInPandas``. Compressed audio
    (MP3/AAC/…) still requires absent libraries and raises loudly.

    Expects (media_id LONG, payload BINARY)."""
    import numpy as np

    from zappy_spark.sources.wavlite import decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in WAV_STATS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decode_wav(bytes(payload))
                x = s.astype(np.float64)
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_frames"].append(int(s.shape[0]))
                out["n_channels"].append(int(s.shape[1]))
                out["duration_ms"].append(
                    int(s.shape[0] * 1000 // max(rate, 1))
                )
                out["rms"].append(float(np.sqrt((x * x).mean())))
                out["peak"].append(int(np.abs(s).max(initial=0)))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=WAV_STATS_SCHEMA)


def resize_png_images(
    df: DataFrame, height: int, width: int
) -> DataFrame:
    """REAL image resize for PNG payloads (round 7): decode with
    sources/pnglite.py, nearest-neighbor resample in numpy, and emit
    the training-loader contract — a RAW pixel buffer of exactly
    height*width*channels bytes with typed dims. The real sibling of
    ``resize_images``' documented fake kernel (still the path for
    codec-less formats). Nearest-neighbor is the deterministic
    resampler (no filtering-kernel ambiguity across libraries), which
    keeps the output byte-exact reproducible anywhere.

    Expects (media_id LONG, payload BINARY of PNG bytes)."""
    import numpy as np

    from zappy_spark.sources.pnglite import decode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "kind": [],
                "payload": [],
                "width": [],
                "height": [],
                "channels": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img, _ = decode_png(bytes(payload))
                h0, w0, nch = img.shape
                ys = (np.arange(height) * h0) // height
                xs = (np.arange(width) * w0) // width
                res = img[ys][:, xs]
                out["media_id"].append(int(mid))
                out["kind"].append("image")
                out["payload"].append(res.tobytes())
                out["width"].append(width)
                out["height"].append(height)
                out["channels"].append(nch)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "kind": out["kind"],
                    "payload": out["payload"],
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "channels": pd.Series(out["channels"], dtype="int32"),
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


GIF_ATTEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_px", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
        StructField("c0", LongType()),
    ]
)


def gif_attest_features(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """GIF codec attestation through the full Spark surface (round 8
    — the z32/m02 playbook applied to giflite): per id, fabricate a
    deterministic 8×8 paletted image from pure integer arithmetic,
    run it through REAL ``encode_gif`` → ``decode_gif`` (palette
    build, variable-width LZW both directions, palette mapping), and
    emit exact-integer statistics of the DECODED pixels. An oracle
    replays the fabrication arithmetic in SQL without touching
    bytes, so any bug anywhere in the codec path flips the value
    hash.

    Fabrication (all exact int): palette index i(y,x) = (id + 3y +
    5x) mod 16; color_i = (17i mod 256, (i²+7) mod 256,
    (29i + id) mod 256). 17i mod 256 is injective for i < 16, so the
    decoded red channel recovers i — ``c0`` counts pixels with
    i = 0 from the decoded image alone.

    Scale: one narrow id column in, six ints out, per-row constant
    work inside Arrow batches; payload bytes never leave the
    executor."""
    import numpy as np

    from zappy_spark.sources.giflite import decode_gif, encode_gif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:8, 0:8]
        for pdf in it:
            out = {k.name: [] for k in GIF_ATTEST_SCHEMA.fields}
            for mid in pdf[id_col]:
                mid = int(mid)
                idx = (mid + 3 * yy + 5 * xx) % 16
                i = np.arange(16)
                pal = np.stack(
                    [
                        (17 * i) % 256,
                        (i * i + 7) % 256,
                        (29 * i + mid) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                rgb = pal[idx]
                dec, _ = decode_gif(encode_gif(rgb))
                assert dec.shape == (8, 8, 3)
                px = dec.astype(np.int64)
                out["media_id"].append(mid)
                out["n_px"].append(64)
                out["r_sum"].append(int(px[:, :, 0].sum()))
                out["g_sum"].append(int(px[:, :, 1].sum()))
                out["b_sum"].append(int(px[:, :, 2].sum()))
                out["c0"].append(int((px[:, :, 0] == 0).sum()))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=GIF_ATTEST_SCHEMA
    )


PATCH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("patch_y", LongType()),
        StructField("patch_x", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)


def image_patch_features(
    df: DataFrame, id_col: str = "media_id", patch: int = 8
) -> DataFrame:
    """ViT-style patch extraction through the full Spark surface
    (round 9 — the m04/z32 attestation playbook applied to the ONE
    multimodal preprocessing shape the corpus lacked: image →
    non-overlapping P×P patch grid, the data movement in front of
    every vision-transformer encoder): per id, fabricate a
    deterministic 16×16 grayscale image px(y,x) = (3·id + 5y + 13x)
    mod 256, push it through REAL ``encode_png`` (Paeth filter —
    the hairiest of the five) → ``decode_png``, reshape the DECODED
    pixels into the patch grid, and emit one row per patch with
    exact-integer stats. An oracle replays the fabrication + patch
    arithmetic in SQL without touching bytes; any bug in the codec
    or the patch bookkeeping flips the hash.

    Scale: one narrow id column in, (16/P)² rows of six ints out,
    constant work per row inside Arrow batches; payloads never
    leave the executor. The same reshape — (H/P, P, W/P, P) →
    transpose — is the production path for real decoded buffers."""
    import numpy as np

    from zappy_spark.sources.pnglite import decode_png, encode_png

    n = 16
    if n % patch:
        raise ValueError(f"patch {patch} must divide {n}")
    g = n // patch

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:n, 0:n]
        for pdf in it:
            out = {k.name: [] for k in PATCH_SCHEMA.fields}
            for mid in pdf[id_col]:
                mid = int(mid)
                img = ((3 * mid + 5 * yy + 13 * xx) % 256).astype(np.uint8)
                dec, meta = decode_png(encode_png(img, filter_type=4))
                if dec.ndim == 3:  # gray decodes H×W×1
                    dec = dec[:, :, 0]
                assert dec.shape == (n, n)
                px = dec.astype(np.int64)
                # (g, P, g, P) -> (g, g, P, P): the ViT patch grid
                grid = px.reshape(g, patch, g, patch).transpose(0, 2, 1, 3)
                for py in range(g):
                    for gx in range(g):
                        p = grid[py, gx]
                        out["media_id"].append(mid)
                        out["patch_y"].append(py)
                        out["patch_x"].append(gx)
                        out["px_sum"].append(int(p.sum()))
                        out["px_min"].append(int(p.min()))
                        out["px_max"].append(int(p.max()))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=PATCH_SCHEMA
    )


PNM_ATTEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
        StructField("bw_black", LongType()),
        StructField("n_px", LongType()),
    ]
)


def pnm_attest_features(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Netpbm codec attestation (round 9 — the m04/m05/m06 playbook
    applied to the SIXTH native codec, previously unit-pinned only):
    per id, fabricate a deterministic 8×8 RGB image and a 0/255
    bitmap from pure integer arithmetic, push them through REAL
    ``encode_pnm``/``decode_pnm`` — binary P6 for the color image,
    bit-packed P4 (MSB-first, row-padded) for the bitmap — and emit
    exact-integer stats of the DECODED pixels. The oracle replays
    the fabrication closed-form, so any raster/bit-packing defect
    flips the hash. Bounded instrument: 100 ids at any corpus size.

    Fabrication: r=(5y+11x+id)%256, g=(3y+x+2id)%256, b=(yx+id)%256;
    bitmap black iff (x+y+id)%3==0 (black decodes to 0, white 255,
    so the black count survives the bit round-trip)."""
    import numpy as np

    from zappy_spark.sources.pnmlite import decode_pnm, encode_pnm

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:8, 0:8]
        for pdf in it:
            out = {k.name: [] for k in PNM_ATTEST_SCHEMA.fields}
            for mid in pdf[id_col]:
                mid = int(mid)
                rgb = np.stack(
                    [
                        (5 * yy + 11 * xx + mid) % 256,
                        (3 * yy + xx + 2 * mid) % 256,
                        (yy * xx + mid) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                dec, meta = decode_pnm(encode_pnm(rgb))
                assert meta["kind"] == "P6" and dec.shape == (8, 8, 3)
                px = dec.astype(np.int64)
                bw = np.where((xx + yy + mid) % 3 == 0, 0, 255).astype(
                    np.uint8
                )
                bdec, bmeta = decode_pnm(encode_pnm(bw, kind="P4"))
                assert bmeta["kind"] == "P4" and bdec.shape == (8, 8)
                out["media_id"].append(mid)
                out["r_sum"].append(int(px[:, :, 0].sum()))
                out["g_sum"].append(int(px[:, :, 1].sum()))
                out["b_sum"].append(int(px[:, :, 2].sum()))
                out["bw_black"].append(int((bdec == 0).sum()))
                out["n_px"].append(64)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=PNM_ATTEST_SCHEMA
    )


WAV_ATTEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_frames", LongType()),
        StructField("zc_total", LongType()),
        StructField("energy", LongType()),
        StructField("active_frames", LongType()),
    ]
)


def wav_attest_features(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Audio framing attestation through the full Spark surface (the
    m04/z32 playbook applied to wavlite + real DSP): per id, fabricate
    a deterministic mono square wave from pure integer arithmetic,
    push it through REAL ``encode_wav`` → ``decode_wav`` (RIFF
    container both directions), then run the standard speech-pipeline
    framing pass — 160-sample frames, per-frame zero-crossing count,
    energy, and active-frame (silence-trim) detection — entirely on
    the DECODED samples. An oracle replays the fabrication closed-form
    in SQL without touching bytes, so a bug anywhere in the container
    round-trip OR the framing kernel flips the value hash.

    Fabrication (all exact int): half-period h = 4 + id%13, amplitude
    a = 1000 + 37·id (< 2^15 for the bounded panel), n = 800 +
    (id%7)·160 samples of which the first n_active = n − (id%5)·160
    carry the wave (the tail is digital silence), rate = 8000 +
    (id%3)·4000. sample[t] = ±a by parity of t÷h, 0 once t ≥ n_active.

    Attested outputs (exact ints): zc_total counts strict sign flips
    between in-frame neighbor samples = #{t ∈ [1, n_active−1] : h|t,
    160∤t}; energy = Σ sample² = a²·n_active; active_frames =
    ⌈n_active/160⌉ — each computable closed-form from id, and each
    recomputed here only from decoded bytes.

    Scale: one narrow id column in, six ints out, constant work per
    row inside Arrow batches; payload bytes never leave the executor."""
    import numpy as np

    from zappy_spark.sources.wavlite import decode_wav, encode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in WAV_ATTEST_SCHEMA.fields}
            for mid in pdf[id_col]:
                mid = int(mid)
                h = 4 + mid % 13
                a = 1000 + 37 * mid
                n = 800 + (mid % 7) * 160
                n_active = n - (mid % 5) * 160
                rate = 8000 + (mid % 3) * 4000
                t = np.arange(n)
                wave = np.where((t // h) % 2 == 0, a, -a)
                wave[n_active:] = 0
                dec, got_rate = decode_wav(
                    encode_wav(wave.astype(np.int16), rate, bits=16)
                )
                x = dec[:, 0].astype(np.int64)
                assert x.shape == (n,)
                fr = x.reshape(n // 160, 160)
                zc = int((fr[:, 1:] * fr[:, :-1] < 0).sum())
                out["media_id"].append(mid)
                out["sample_rate"].append(int(got_rate))
                out["n_frames"].append(n // 160)
                out["zc_total"].append(zc)
                out["energy"].append(int((x * x).sum()))
                out["active_frames"].append(
                    int((np.abs(fr).max(axis=1) > 0).sum())
                )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=WAV_ATTEST_SCHEMA
    )


MEL_ATTEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("peak_bin", LongType()),
        StructField("peak_power", LongType()),
        StructField("specsum", LongType()),
        StructField("mel_n_filters", LongType()),
        StructField("mel_argmax", LongType()),
        StructField("mel_lo", LongType()),
        StructField("mel_hi", LongType()),
    ]
)


def mel_filterbank(
    n_mels: int = 12,
    n_fft: int = 160,
    sr: int = 8000,
    fmin: float = 0.0,
    fmax: float = 4000.0,
):
    """Standard HTK-mel triangular filterbank over the rfft bins
    (mel(f) = 2595·log10(1 + f/700), n_mels+2 equally-mel-spaced
    edge points, unnormalized triangles — adjacent filters'
    rising/falling slopes are complementary, so every interior bin's
    weights sum to exactly 1). Pure numpy, id-independent constants:
    the speech-feature reduction matrix every ASR/audio-LM frontend
    applies after the power spectrum."""
    import numpy as np

    def h2m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def m2h(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = m2h(np.linspace(h2m(fmin), h2m(fmax), n_mels + 2))
    bins = np.arange(n_fft // 2 + 1) * (sr / n_fft)
    w = np.zeros((n_mels, len(bins)))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        w[m] = np.clip(
            np.minimum((bins - lo) / (c - lo), (hi - bins) / (hi - c)),
            0.0,
            None,
        )
    return w


def mel_attest_features(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Mel-filterbank audio features through the full Spark surface
    (round 12, VERDICT r11 item 5 — the audio analog of m06's ViT
    patch attestation; the m04/m05/z32 playbook): per id, fabricate
    a two-tone test signal that is EXACTLY integer-valued and EXACTLY
    bin-aligned — x[t] = A·cos(2π·40t/160) + B·cos(2π·80t/160), whose
    samples cycle the integer pattern [A+B, −B, B−A, −B] (the only
    cosine phases with all-integer samples), A = 1000+4·id (divisible
    by 4 so B = A/4 is exact on even ids; B = 2A on odd ids) — push it
    through REAL ``encode_wav`` → ``decode_wav`` (RIFF both ways),
    frame the DECODED samples at 160, take the full-DFT power
    spectrum per frame (numpy FFT inside Arrow ``mapInPandas``), sum
    across frames, and reduce the rfft half with a 12-filter HTK mel
    bank (``mel_filterbank``).

    Closed-form oracle on the pure tones — every output an exact
    BIGINT:
    - Parseval pins ``specsum`` = Σ_k|X_k|² = n_frames·160·Σ_t x_t²
      = n_frames·160·(80A² + 160B²) (per 4-sample period Σx² =
      (A+B)² + B² + (A−B)² + B² = 2A² + 4B²); the numeric FFT lands
      within 7e-5 of the integer (measured over the panel) so the
      round is deterministic.
    - Single-bin energy pins ``peak_bin``/``peak_power``: the signal
      has power ONLY at bins 40, 80, 120 — |X_40|² = (80A)² (+mirror
      at 120), |X_80|² = (160B)² (Nyquist, unmirrored) — so the rfft
      argmax is 40 on even ids ((80A)² > (40A)²) and 80 on odd
      ((320A)² > (80A)²), with peak_power = n_frames·(80A)² /
      n_frames·(320A)² exactly (measured FFT error: 0.0).
    - The mel reduction pins ``mel_argmax``/``mel_lo``/``mel_hi``:
      bin 40 = 2000 Hz falls in filters 8 (w=0.796) and 9 (w=0.204)
      of the 12-filter 0–4000 Hz bank, bin 80 = 4000 Hz sits ON the
      last filter's falling edge (weight exactly 0), so filter 8 wins
      on every id with ≥74% relative margin — constants (8, 32, 46)
      a wrong mel geometry, wrong bank shape, or wrong spectrum
      cannot reproduce.

    Scale: one narrow id column in, nine ints out, constant work per
    row inside Arrow batches; payload bytes never leave the executor;
    bounded 100-id instrument at any corpus size."""
    import numpy as np

    from zappy_spark.sources.wavlite import decode_wav, encode_wav

    w_mel = mel_filterbank()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in MEL_ATTEST_SCHEMA.fields}
            for mid in pdf[id_col]:
                mid = int(mid)
                a = 1000 + 4 * mid
                b = 2 * a if mid % 2 else a // 4
                n = 800 + (mid % 7) * 160
                pat = np.array([a + b, -b, b - a, -b], dtype=np.int64)
                assert np.abs(pat).max() < 32768
                wave = np.tile(pat, n // 4).astype(np.int16)
                dec, _rate = decode_wav(encode_wav(wave, 8000, bits=16))
                x = dec[:, 0].astype(np.float64)
                assert x.shape == (n,)
                fr = x.reshape(n // 160, 160)
                spec = np.fft.fft(fr, axis=1)
                power = spec.real**2 + spec.imag**2
                half = power[:, :81].sum(axis=0)
                peak = int(half.argmax())
                mel_e = w_mel @ half
                marg = int(mel_e.argmax())
                support = np.nonzero(w_mel[marg])[0]
                out["media_id"].append(mid)
                out["n_frames"].append(n // 160)
                out["peak_bin"].append(peak)
                out["peak_power"].append(int(round(float(half[peak]))))
                out["specsum"].append(int(round(float(power.sum()))))
                out["mel_n_filters"].append(w_mel.shape[0])
                out["mel_argmax"].append(marg)
                out["mel_lo"].append(int(support[0]))
                out["mel_hi"].append(int(support[-1]))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=MEL_ATTEST_SCHEMA
    )


EMB_PNG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def embedding_png_images(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Render embeddings as REAL grayscale PNG payloads (round 8):
    each 64-dim vector quantizes to an 8×8 uint8 image via
    px = clamp(floor((x + 1) · 127.5), 0, 255) — two IEEE double
    ops + an exact floor, bit-reproducible on any engine from the
    same float32 inputs — and is encoded with the spec-pinned
    pnglite encoder. This is the bytes-producing half of the
    perceptual-hash dedup pipeline (d45): downstream operators see
    only (media_id, payload), exactly what a crawl's image corpus
    looks like."""
    import numpy as np

    from zappy_spark.sources.pnglite import encode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, vec in zip(pdf[id_col], pdf[vec_col]):
                v = np.asarray(vec, dtype=np.float32).astype(np.float64)
                if v.shape[0] != 64:
                    raise ValueError(
                        f"embedding dim {v.shape[0]} != 64 (8x8 image)"
                    )
                px = np.clip(np.floor((v + 1.0) * 127.5), 0, 255)
                img = px.astype(np.uint8).reshape(8, 8, 1)
                ids.append(int(mid))
                payloads.append(encode_png(img, filter_type=0))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        batches, schema=EMB_PNG_SCHEMA
    )


IMAGE_HASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("a0", LongType()),
        StructField("a1", LongType()),
        StructField("a2", LongType()),
        StructField("a3", LongType()),
        StructField("d0", LongType()),
        StructField("d1", LongType()),
        StructField("d2", LongType()),
        StructField("d3", LongType()),
    ]
)


def image_hash_bands(df: DataFrame) -> DataFrame:
    """Perceptual hashes (aHash + dHash) over REAL decoded pixels,
    emitted directly as 4×16-bit / 4×14-bit BAND integers (round 8).

    aHash: 8×8 grayscale, bit_k = (px_k · 64 > Σpx) — the mean
    comparison cross-multiplied to exact integers, no division.
    dHash: horizontal gradient sign, bit = (px[y][x+1] > px[y][x]),
    8 rows × 7 comparisons = 56 bits. Bands (not one 64-bit value)
    are the native output because (a) banding IS the LSH blocking
    key downstream and (b) bit 63 of a packed BIGINT is the sign
    bit — both engines handle it, but every shift/compare spelling
    must then be audited; 16-bit bands stay tiny positive ints.

    Images larger than 8×8 are reduced by exact integer block-mean
    (floor); multi-channel images reduce to gray = (r+g+b)//3 per
    pixel first — all arithmetic exact, so a SQL oracle can replay
    every bit. Runs the real decode path (PNG/BMP/GIF/PNM via
    decode_image) inside Arrow ``mapInPandas``."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in IMAGE_HASH_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                px = img.astype(np.int64)
                if px.ndim == 3 and px.shape[2] >= 3:
                    px = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
                elif px.ndim == 3:
                    px = px[:, :, 0]
                h, w = px.shape
                if h % 8 or w % 8:
                    raise ValueError(
                        f"image {h}x{w} not block-reducible to 8x8"
                    )
                bh, bw = h // 8, w // 8
                px = (
                    px.reshape(8, bh, 8, bw).sum(axis=(1, 3)) // (bh * bw)
                )
                flat = px.reshape(-1)
                total = int(flat.sum())
                abits = (flat * 64 > total).astype(np.int64)
                dbits = (px[:, 1:] > px[:, :-1]).astype(np.int64).reshape(-1)
                out["media_id"].append(int(mid))
                for b in range(4):
                    seg = abits[b * 16 : (b + 1) * 16]
                    out[f"a{b}"].append(
                        int((seg << np.arange(16)).sum())
                    )
                    dseg = dbits[b * 14 : (b + 1) * 14]
                    out[f"d{b}"].append(
                        int((dseg << np.arange(14)).sum())
                    )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_HASH_SCHEMA
    )


# ---------------------------------------------------------------
# MFCC attestation (round 12, m09) — the cepstral half of the
# audio-LM frontend on top of m08's mel stack: DCT-II over the
# log-mel energies. On the m08 two-tone panel the mel energies
# land ONLY in filters 8 and 9 (bin 80 = 4000 Hz sits exactly on
# the bank's falling edge, weight 0), so every coefficient has the
# closed form c_j = S_j·log10(nf·A²) + D_j with S_j = C[j,8]+C[j,9]
# and D_j = log10(6400·w8)·C[j,8] + log10(6400·w9)·C[j,9] — the
# oracle replays it from these PRECOMPUTED spec constants (derived
# from mel_filterbank + math.cos at import, never from the
# pipeline under test). Measured over the 100-id panel: pipeline
# vs closed form agree to 3.6e-15 (machine precision), floor
# boundaries sit >= 3.3e-9 c-units away (~1e6x the disagreement),
# the j>=1 argmax margin is 3.39.
# ---------------------------------------------------------------

MFCC_N = 12
MFCC_SCALE = 10**6


def _m09_dct_terms() -> list[tuple[int, float, float]]:
    """(j, S_j, D_j) for j = 0..11 — the closed-form DCT terms of
    the m08 panel's log-mel vector, from the filterbank SPEC."""
    import math

    w = mel_filterbank()
    k8 = math.log10(6400.0 * float(w[8, 40]))
    k9 = math.log10(6400.0 * float(w[9, 40]))
    out = []
    for j in range(MFCC_N):
        c8 = math.cos(math.pi * j * 8.5 / MFCC_N)
        c9 = math.cos(math.pi * j * 9.5 / MFCC_N)
        out.append((j, c8 + c9, k8 * c8 + k9 * c9))
    return out


MFCC_ATTEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_mel", LongType()),
        StructField("n_mfcc", LongType()),
        StructField("c0_fp", LongType()),
        StructField("c1_fp", LongType()),
        StructField("cmax_j", LongType()),
        StructField("cmax_sign", LongType()),
    ]
)


def mfcc_attest_features(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """MFCC features through the full Spark surface (round 12 —
    the cepstral stage every ASR/audio-LM frontend applies after
    m08's mel reduction): the same exactly-integer two-tone panel
    rides REAL encode_wav → decode_wav → 160-sample framing →
    full-DFT power spectrum → 12-filter HTK mel bank →
    log10(max(E, 1)) → unnormalized DCT-II (HTK convention), all
    inside ONE Arrow mapInPandas batch fn.

    Outputs per id, all exact BIGINTs: c0/c1 quantized
    floor(c·10^6 + 0.5) (explicit half-up — the t47 doctrine), the
    argmax-|c_j| coefficient over j >= 1 (measured margin 3.39 —
    a wrong DCT geometry cannot reproduce it) and its sign.
    Boundary safety is MEASURED, not hoped: floors sit >= 3.3e-9
    c-units from the nearest boundary while the pipeline and the
    oracle's closed form agree to 3.6e-15.

    Scale: one narrow id column in, seven ints out, constant work
    per row inside Arrow batches; bounded 100-id instrument."""
    import math

    import numpy as np

    from zappy_spark.sources.wavlite import decode_wav, encode_wav

    w_mel = mel_filterbank()
    dct = np.cos(
        np.pi
        * np.arange(MFCC_N)[:, None]
        * (np.arange(MFCC_N)[None, :] + 0.5)
        / MFCC_N
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in MFCC_ATTEST_SCHEMA.fields}
            for mid in pdf[id_col]:
                mid = int(mid)
                a = 1000 + 4 * mid
                b = 2 * a if mid % 2 else a // 4
                n = 800 + (mid % 7) * 160
                pat = np.array([a + b, -b, b - a, -b], dtype=np.int64)
                wave = np.tile(pat, n // 4).astype(np.int16)
                dec, _rate = decode_wav(encode_wav(wave, 8000, bits=16))
                x = dec[:, 0].astype(np.float64)
                spec = np.fft.fft(x.reshape(n // 160, 160), axis=1)
                half = (spec.real**2 + spec.imag**2)[:, :81].sum(axis=0)
                logmel = np.log10(np.maximum(w_mel @ half, 1.0))
                c = dct @ logmel
                jmax = 1 + int(np.abs(c[1:]).argmax())
                out["media_id"].append(mid)
                out["n_mel"].append(w_mel.shape[0])
                out["n_mfcc"].append(MFCC_N)
                out["c0_fp"].append(
                    int(math.floor(c[0] * MFCC_SCALE + 0.5))
                )
                out["c1_fp"].append(
                    int(math.floor(c[1] * MFCC_SCALE + 0.5))
                )
                out["cmax_j"].append(jmax)
                out["cmax_sign"].append(1 if c[jmax] > 0 else -1)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=MFCC_ATTEST_SCHEMA
    )


DELTA_ATTEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("d1_first_fp", LongType()),
        StructField("d1_mid_fp", LongType()),
        StructField("d1_last_fp", LongType()),
        StructField("dd1_mid_fp", LongType()),
    ]
)


def delta_cepstra_attest_features(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Delta and delta-delta cepstra through the full Spark surface
    (round 12 — the temporal-derivative stage that completes the
    classic ASR frontend after m08's mel bank and m09's DCT): a
    per-frame RISING-amplitude variant of the m09 panel (frame f
    scales the exactly-integer two-tone pattern by a0 + 16f, so
    consecutive frames differ and the derivatives are non-trivial)
    rides REAL encode_wav → decode_wav → 160-sample framing →
    per-frame DFT power → 12-filter HTK mel bank → log10(max(E,1))
    → DCT-II → HTK N=2 regression deltas with edge replication
    (c[t<0] = c[0], c[t>nf-1] = c[nf-1]) → the same regression
    again for delta-delta, all inside ONE Arrow mapInPandas batch
    fn.

    Because each frame's mel energy lands only in filters 8/9,
    c_j(f) = S_j·t_f + D_j with t_f = log10(a_f²) — so the D_j
    offsets CANCEL in every delta and the oracle replays
    d_j(t) = S_j·g(t) from the spec-derived S_1 alone (closed form,
    never the pipeline under test). Emits per id the exact BIGINTs
    n_frames and floor(d·10^6 + 0.5) of d1 at the first, middle and
    last frame (first/last exercise the edge replication) plus
    delta-delta at the middle. Margins MEASURED over the panel:
    pipeline vs closed form 9.4e-16, floor boundaries >= 4.8e-11
    c-units (~5e4x separation).

    Scale: one narrow id column in, six ints out, constant work per
    row inside Arrow batches; bounded 100-id instrument."""
    import math

    import numpy as np

    from zappy_spark.sources.wavlite import decode_wav, encode_wav

    w_mel = mel_filterbank()
    dct = np.cos(
        np.pi
        * np.arange(MFCC_N)[:, None]
        * (np.arange(MFCC_N)[None, :] + 0.5)
        / MFCC_N
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in DELTA_ATTEST_SCHEMA.fields}
            for mid in pdf[id_col]:
                mid = int(mid)
                a0 = 200 + mid
                nf = 5 + mid % 4
                frames = []
                for f in range(nf):
                    a = a0 + 16 * f
                    b = 2 * a
                    pat = np.array(
                        [a + b, -b, b - a, -b], dtype=np.int64
                    )
                    frames.append(np.tile(pat, 40))
                wave = np.concatenate(frames).astype(np.int16)
                dec, _rate = decode_wav(encode_wav(wave, 8000, bits=16))
                x = dec[:, 0].astype(np.float64)
                spec = np.fft.fft(x.reshape(nf, 160), axis=1)
                power = (spec.real**2 + spec.imag**2)[:, :81]
                logmel = np.log10(np.maximum(power @ w_mel.T, 1.0))
                c = logmel @ dct.T

                def _delta(s: "np.ndarray") -> "np.ndarray":
                    p = np.vstack([s[0], s[0], s, s[-1], s[-1]])
                    return (
                        p[3 : 3 + nf]
                        - p[1 : 1 + nf]
                        + 2 * (p[4 : 4 + nf] - p[0:nf])
                    ) / 10.0

                d = _delta(c)
                dd = _delta(d)
                m = nf // 2

                def _q(v: float) -> int:
                    return int(math.floor(v * MFCC_SCALE + 0.5))

                out["media_id"].append(mid)
                out["n_frames"].append(nf)
                out["d1_first_fp"].append(_q(d[0, 1]))
                out["d1_mid_fp"].append(_q(d[m, 1]))
                out["d1_last_fp"].append(_q(d[nf - 1, 1]))
                out["dd1_mid_fp"].append(_q(dd[m, 1]))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=DELTA_ATTEST_SCHEMA
    )


def shot_boundary_ledger(
    df: DataFrame,
    tau: int = 8,
    frame_bytes: int = 32,
) -> DataFrame:
    """Shot-boundary detection over frame-decoded video payloads —
    the scene-segmentation pass a video training pipeline runs to
    cut clips at content changes: decode EVERY frame (the m03
    Arrow flatMap, every_n=1), then flag a boundary wherever the
    mean byte value jumps by more than ``tau`` between consecutive
    frames. The comparison is integer CROSS-MULTIPLIED —
    |sum_f·len_prev − sum_prev·len_f| > tau·len_f·len_prev — so a
    short tail frame is handled exactly and NO float ever enters
    (no margin discipline needed; both engines compare the same
    BIGINTs).

    Output per media, all exact BIGINTs: (media_id, n_frames,
    n_boundaries, first_boundary_idx) with -1 when no boundary —
    a degenerate clip is visible, not NULL.

    Scale: the Arrow stage visits each payload once and fans out
    to frame rows; the boundary pass is ONE media-partitioned LAG
    window over (frame_idx, len, sum) — never the payload — and a
    |media|-row agg. Bound the instrument with a scan-side id
    filter (the d52 doctrine) when fixtures grow."""
    from pyspark.sql.window import Window

    feats = sample_frame_features(
        df, frame_bytes=frame_bytes, every_n=1
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev_sum = F.lag("frame_sum").over(w)
    prev_len = F.lag("frame_len").over(w)
    jump = F.abs(
        F.col("frame_sum") * prev_len - prev_sum * F.col("frame_len")
    )
    bnd = (
        F.when(prev_sum.isNull(), F.lit(0))
        .when(
            jump
            > F.lit(tau) * F.col("frame_len") * prev_len,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    marked = feats.select(
        "media_id",
        "frame_idx",
        bnd.cast("bigint").alias("_b"),
    )
    return (
        marked.groupBy("media_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum("_b").alias("n_boundaries"),
            F.coalesce(
                F.min(
                    F.when(F.col("_b") == 1, F.col("frame_idx"))
                ).cast("bigint"),
                F.lit(-1).cast("bigint"),
            ).alias("first_boundary_idx"),
        )
    )
