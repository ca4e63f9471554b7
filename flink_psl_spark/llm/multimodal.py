"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Design: media bytes live in a ``binary`` column next to typed metadata
(media_type, width/height/duration, codec). All per-item work goes through
``mapInPandas`` so bytes move once per Arrow batch, never per row; batch
size is bounded by ``maxRecordsPerBatch`` to keep executor memory flat at
100 TB (large blobs → small batches).

Codecs are gated on library availability: with PIL / av installed the real
decoders run; without them (this container) a **deterministic fake decode**
stands in — payload bytes tiled into an H×W×3 uint8 array — so the entire
decode → resize → featurize pipeline still executes end-to-end with real
Arrow batching, real schemas, and content-dependent outputs that tests and
oracles can pin down. Swapping the fake for the real codec changes no plan
shape and no schema.
"""

from __future__ import annotations

import io
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from flink_psl_spark.materialize import materialize

try:  # real image codec
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except Exception:  # pragma: no cover - container has no pillow
    _PILImage = None
    _HAVE_PIL = False

try:  # real video codec
    import av as _av  # noqa: F401

    _HAVE_AV = True
except Exception:  # pragma: no cover
    _av = None
    _HAVE_AV = False

#: True when at least the image codec is real (PIL present).
DECODERS_AVAILABLE = _HAVE_PIL

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("payload_sha", T.StringType(), True),
    ]
)


def _fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector.

    Derived from the payload bytes so tests get stable, content-dependent
    values with the exact shape a real extractor would emit.
    """
    if payload is None:
        return [0.0] * dim
    acc, out = 2166136261, []
    for i, b in enumerate(payload[:256]):
        acc = (acc ^ b) * 16777619 % (1 << 32)
        if i % 32 == 31:
            out.append((acc % 10_000) / 10_000.0)
    while len(out) < dim:
        acc = acc * 16777619 % (1 << 32)
        out.append((acc % 10_000) / 10_000.0)
    return out[:dim]


def fake_decode_image(
    payload: bytes | None, width: int | None = None, height: int | None = None
) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes tiled into H×W×3 uint8.

    Shape comes from metadata when given, else ~sqrt sizing capped at 64 —
    the same contract a real decoder has (content-dependent pixels, metadata-
    or content-dependent shape), reproducible anywhere.
    """
    if not payload:
        return np.zeros((1, 1, 3), dtype=np.uint8)
    if width is None or height is None:
        side = min(64, max(1, math.isqrt(len(payload) // 3 or 1)))
        width = width or side
        height = height or side
    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
    need = width * height * 3
    reps = -(-need // len(buf))
    return np.tile(buf, reps)[:need].reshape(height, width, 3)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Minimal stdlib-only PNG decoder → H×W×3 uint8 RGB.

    Implements the public PNG specification (RFC 2083 / W3C PNG): chunk
    walk, zlib inflate of IDAT, per-row unfiltering (None/Sub/Up/Average/
    Paeth), for 8-bit greyscale (0), RGB (2), grey+alpha (4) and RGBA (6),
    non-interlaced. Alpha is dropped, grey replicated to RGB. Palette and
    interlaced images raise (→ caller falls back). This keeps a REAL
    image-decode branch exercisable without PIL in the container.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in (0, 2, 4, 6):
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 1:  # Sub: add left (per channel) — sequential in x
            for x in range(channels, stride):
                row[x] = (int(row[x]) + int(row[x - channels])) & 0xFF
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - channels]) if x >= channels else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                row[x] = (int(row[x]) + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = row
        prev = row
    px = out.reshape(height, width, channels)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA → RGB


def decode_image(
    payload: bytes | None, *, width: int | None = None, height: int | None = None
) -> np.ndarray:
    """Decode an image payload to an H×W×3 uint8 RGB array.

    Real paths: PIL when present (any format), else the stdlib PNG decoder
    for PNG payloads; fallback is the deterministic fake above, keeping the
    pipeline runnable codec-free for non-PNG payloads.
    """
    if payload:
        if _HAVE_PIL:
            try:
                img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
                return np.asarray(img, dtype=np.uint8)
            except Exception:
                pass  # not a decodable image → deterministic fallback
        elif bytes(payload[:8]) == _PNG_MAGIC:
            try:
                return decode_png(bytes(payload))
            except Exception:
                pass
    return fake_decode_image(payload, width, height)


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index arrays (pure numpy, vectorized)."""
    ys = (np.arange(out_h) * img.shape[0]) // out_h
    xs = (np.arange(out_w) * img.shape[1]) // out_w
    return img[ys][:, xs]


def decode_resize_stats(
    media: DataFrame, *, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """Image pipeline: decode → resize → per-channel stats via mapInPandas.

    One Arrow hop for the whole chain; constant memory (iterator of
    batches). Emits (media_id, width, height, n_px, mean_r/g/b,
    payload_sha); width/height are the post-resize shape, so results are
    schema-stable regardless of source dimensions — exactly what a training
    preprocessor does before batching tensors.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in IMAGE_STATS_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload)
                small = resize_image(img, out_w, out_h)
                means = small.reshape(-1, 3).mean(axis=0)
                out["media_id"].append(mid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["n_px"].append(int(small.size))
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["payload_sha"].append(
                    hashlib.sha256(payload).hexdigest()
                    if payload is not None
                    else None
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, IMAGE_STATS_SCHEMA)


def extract_features(media: DataFrame, *, feature_dim: int = 8) -> DataFrame:
    """Per-item media featurization via mapInPandas (Arrow-batched).

    Byte-level stats plus a deterministic (fake) feature vector per item;
    the iterator-of-batches signature means constant memory regardless of
    input size. A real embedding model slots into the same loop.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [
                        _fake_feature(p, feature_dim) for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Frame index sampling (expression-only): which frames a decoder would
    keep. See ``sample_frame_payloads`` for the payload-emitting variant."""
    return (
        media.where(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.length("payload") / every_n).cast("int") - 1, F.lit(0)
                    ),
                )
            ),
        )
        .select("media_id", "frame_idx")
    )


def sample_frame_payloads(
    media: DataFrame, *, frame_len: int = 32, stride: int = 64
) -> DataFrame:
    """Video frame sampling with payloads.

    Real path (``av`` present) would decode true frames inside mapInPandas;
    codec-free path models a fixed-bitrate stream: frame *k* is the
    ``frame_len``-byte window at byte offset ``k·stride`` — pure binary
    ``substring`` expressions, so the whole extraction runs in whole-stage
    codegen with zero Python. Emits (media_id, frame_idx, frame_bytes).
    """
    if _HAVE_AV:  # pragma: no cover - container has no av
        return _decode_real_frames(media, frame_len=frame_len, stride=stride)
    vids = media.where(F.col("media_type") == "video")
    n_frames = F.greatest(
        ((F.length("payload") - frame_len) / stride).cast("int") + 1, F.lit(0)
    )
    return (
        vids.select(
            "media_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(int((length(payload) - {frame_len}) / {stride}) + 1, 0)), "
                    f"i -> substring(payload, (i - 1) * {stride} + 1, {frame_len}))"
                )
            ).alias("frame_idx", "frame_bytes"),
        )
        .where(F.length("frame_bytes") > 0)
    )


def _decode_real_frames(
    media: DataFrame, *, frame_len: int, stride: int
) -> DataFrame:  # pragma: no cover - requires av
    """Real video frame extraction (av): same output schema as the fake."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with _av.open(io.BytesIO(payload)) as container:
                    for i, frame in enumerate(container.decode(video=0)):
                        rows.append(
                            (mid, i, frame.to_ndarray(format="rgb24").tobytes())
                        )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes"]
            )

    vids = media.where(F.col("media_type") == "video")
    return vids.mapInPandas(run, schema)


def audio_stats(media: DataFrame, *, sample_rate: int = 16000) -> DataFrame:
    """Audio duration/sample stats, expression-only.

    Codec-free model: payload is 16-bit PCM mono at ``sample_rate`` (the
    post-decode shape every audio loader emits), so sample count and
    duration derive from byte length in codegen. A real decoder (soundfile)
    replaces the arithmetic with parsed headers, same schema.
    """
    auds = media.where(F.col("media_type") == "audio")
    n_samples = F.expr("int(length(payload) / 2)")
    return auds.select(
        "media_id",
        n_samples.cast("bigint").alias("n_samples"),
        F.round(n_samples / sample_rate, 6).alias("duration_s"),
    )


def synthetic_media(spark, documents: DataFrame, *, media_type: str = "image") -> DataFrame:
    """Build a media table from the documents fixture (text bytes as payload)
    so the multimodal plumbing is exercised end-to-end without real codecs."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Real RIFF/WAVE bytes (16-bit PCM mono) from an int sequence —
    stdlib ``wave`` writer, no third-party codec."""
    import io
    import wave

    arr = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Parse real WAV bytes with the stdlib ``wave`` reader → (n_channels,
    sample_rate, samples int16 ndarray). The genuine-codec audio branch
    (the audio twin of ``decode_png``): header walk + PCM frames, no
    third-party dependency."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        nch = w.getnchannels()
        rate = w.getframerate()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        data = w.readframes(w.getnframes())
    return nch, rate, np.frombuffer(data, dtype=np.int16)


def try_decode_wav(payload):
    """``decode_wav`` with the degenerate-input contract (r12): returns
    None for ANY unparseable payload — NULL, zero-byte, truncated RIFF,
    non-WAV bytes, zero/negative header rate — instead of raising. At
    100 TB one malformed clip is a certainty, and pre-r12 it killed the
    whole task (the same defect class the r11 sweep fixed in the ANN
    kernels). Callers map None to NULL output columns: malformed rows
    are never dropped and never crash, and a NULL fingerprint never
    joins a dedup group."""
    if payload is None:
        return None
    try:
        nch, rate, samples = decode_wav(payload)
    except Exception:
        return None
    if nch <= 0 or rate <= 0:
        return None
    return nch, rate, samples


def wav_stats(media: DataFrame) -> DataFrame:
    """Decode REAL WAV payloads (stdlib codec) and emit per-clip stats:
    channel count, sample rate, sample count, duration, integer-exact RMS.
    Arrow-batched mapInPandas — row-local, scan-parallel at any scale."""
    import pandas as pd

    auds = media.where(F.col("media_type") == "audio").select(
        "media_id", "payload"
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                dec = try_decode_wav(payload)
                if dec is None:
                    # malformed clip: NULL stats, row kept (r12 contract)
                    rows.append((int(mid), None, None, None, None, None))
                    continue
                nch, rate, samples = dec
                n = int(len(samples))
                # integer sum of squares -> exact across engines
                ssq = int((samples.astype(np.int64) ** 2).sum())
                rms = round(math.sqrt(ssq / n), 6) if n else 0.0
                rows.append(
                    (int(mid), nch, rate, n, round(n / rate, 6), rms)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return auds.mapInPandas(run, schema)


def synthetic_wav_media(spark, documents: DataFrame) -> DataFrame:
    """Media table with REAL WAV payloads, deterministically synthesized
    from doc_id (n = 100 + doc_id % 400 samples of the integer waveform
    (doc_id * 31 + i * 7) % 2048 - 1024 at 8 kHz) — a DuckDB oracle can
    derive the expected decoded stats analytically while the Spark side
    round-trips genuine RIFF/WAVE bytes."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def build(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 100 + did % 400
                samples = [(did * 31 + i * 7) % 2048 - 1024 for i in range(n)]
                rows.append((did, "audio", encode_wav(samples, 8000)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "payload"])

    return documents.select("doc_id").mapInPandas(build, schema)


def dhash_kernel(img: np.ndarray, *, hash_size: int = 8) -> int:
    """Difference hash (dHash) of an H×W×3 uint8 image: grayscale →
    nearest-neighbor resize to hash_size×(hash_size+1) → sign of the
    horizontal gradient → hash_size² bits packed into a signed 64-bit
    int (the classic perceptual hash for near-duplicate images; robust
    to rescaling/re-encoding, unlike byte hashes)."""
    gray = img.astype(np.float64).mean(axis=2)
    ys = (np.arange(hash_size) * gray.shape[0]) // hash_size
    xs = (np.arange(hash_size + 1) * gray.shape[1]) // (hash_size + 1)
    small = gray[ys][:, xs]
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    acc = np.uint64(0)
    for b in bits:
        acc = (acc << np.uint64(1)) | np.uint64(bool(b))
    return int(acc.astype(np.int64))


def image_dhash(media: DataFrame, *, hash_size: int = 8) -> DataFrame:
    """Per-image dHash over the decode pipeline (mapInPandas — bytes move
    once per Arrow batch). Returns (media_id, dhash bigint)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload)
                ids.append(mid)
                hashes.append(dhash_kernel(img, hash_size=hash_size))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id bigint, dhash bigint"
    )


def image_dedup(media: DataFrame, *, hash_size: int = 8) -> DataFrame:
    """Perceptual image dedup: group by dHash, keep the lowest media_id
    per group (images that re-encode/rescale to the same gradient
    structure collapse together). ONE shuffle keyed by the 64-bit hash —
    the image-side counterpart of exact text dedup; chain with a
    hamming-banded pass (simhash-style) for near-dup tolerance.

    Returns (media_id, dhash, survivor boolean, group_size bigint).
    """
    from pyspark.sql import Window

    hashed = image_dhash(media, hash_size=hash_size)
    w = Window.partitionBy("dhash")
    return hashed.select(
        "media_id",
        "dhash",
        (F.col("media_id") == F.min("media_id").over(w)).alias("survivor"),
        F.count("*").over(w).alias("group_size"),
    )


def image_near_dedup(
    media: DataFrame, *, hash_size: int = 8, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate image removal: drop every image whose dHash is
    within ``max_hamming`` bits of a lower-id image's hash.

    Candidate generation is the same block-permutation trick as SimHash
    text dedup (llm/dedup.py simhash_candidate_pairs): split the 64-bit
    hash into max_hamming+1 blocks — any pair within the budget agrees
    exactly on at least one block (pigeonhole), so the self-join keys on
    (block index, block value) and bit_count verifies. One shuffle; no
    all-pairs work.

    Returns the surviving media rows (all input columns).
    """
    from flink_psl_spark.llm.dedup import hamming64

    # hashes materialized before the block self-join — same double-eval
    # fix as the text LSH paths: the self-join otherwise plans the
    # image-decode + dHash Arrow kernel on BOTH sides (Python-UDF
    # canonicalization defeats exchange reuse), decoding every image
    # twice. The materialized frame is n_media × (id, one long).
    hashed = image_dhash(media, hash_size=hash_size).select(
        F.col("media_id").alias("__id"), F.col("dhash").alias("__fp")
    ).transform(materialize)
    if max_hamming == 0:  # exact-hash grouping — one block IS the hash
        dropped = (
            hashed.alias("l")
            .join(
                hashed.alias("r"),
                (F.col("l.__fp") == F.col("r.__fp"))
                & (F.col("l.__id") < F.col("r.__id")),
            )
            .select(F.col("r.__id").alias("media_id"))
            .distinct()
        )
        return media.join(dropped, on="media_id", how="left_anti")
    blocks = max_hamming + 1
    width = 64 // blocks
    banded = hashed.select(
        "__id",
        "__fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__fp"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("__blk", "__bh"),
    )
    dropped = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.__blk") == F.col("r.__blk"))
            & (F.col("l.__bh") == F.col("r.__bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .where(hamming64(F.col("l.__fp"), F.col("r.__fp")) <= max_hamming)
        .select(F.col("r.__id").alias("media_id"))
        .distinct()
    )
    return media.join(dropped, on="media_id", how="left_anti")


def audio_fingerprint_kernel(
    samples: np.ndarray, *, n_windows: int = 64
) -> int:
    """Energy-delta audio fingerprint: split the clip into ``n_windows``
    equal windows, compute per-window energy (integer sum of squares),
    hash the SIGN of consecutive-window energy deltas into a 63-bit int —
    the audio twin of the image dHash (robust to volume scaling: signs of
    energy deltas are amplitude-ratio invariant)."""
    n = len(samples)
    if n == 0:
        return 0
    bounds = (np.arange(n_windows + 1) * n) // n_windows
    sq = np.concatenate(([0], np.cumsum(samples.astype(np.int64) ** 2)))
    energy = sq[bounds[1:]] - sq[bounds[:-1]]
    bits = energy[1:] > energy[:-1]
    acc = np.uint64(0)
    for b in bits:
        acc = (acc << np.uint64(1)) | np.uint64(bool(b))
    return int(acc.astype(np.int64))


def audio_fingerprint(media: DataFrame, *, n_windows: int = 64) -> DataFrame:
    """Per-clip audio fingerprint over the real WAV codec (one Arrow
    batched scan). Returns (media_id, afp bigint)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                dec = try_decode_wav(payload)
                ids.append(int(mid))
                fps.append(
                    audio_fingerprint_kernel(dec[2], n_windows=n_windows)
                    if dec is not None
                    else None  # malformed clip → NULL fingerprint (r12)
                )
            yield pd.DataFrame(
                {"media_id": ids, "afp": pd.array(fps, dtype="Int64")}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id bigint, afp bigint"
    )


def audio_dedup(media: DataFrame, *, n_windows: int = 64) -> DataFrame:
    """Fingerprint-exact audio dedup: group by the energy-delta
    fingerprint, keep the lowest media_id — clips that differ only in
    overall volume collapse together (same energy-delta signs). One
    shuffle keyed by the 63-bit fingerprint.

    Returns (media_id, afp, survivor boolean, group_size bigint).
    """
    from pyspark.sql import Window

    fp = audio_fingerprint(media, n_windows=n_windows)
    w = Window.partitionBy("afp")
    # NULL fingerprints (undecodable clips, r12 contract) are unscorable:
    # each is its own singleton survivor — Window.partitionBy groups all
    # NULL keys into ONE partition, which would otherwise mark every
    # malformed clip a duplicate of the lowest-id one
    bad = F.col("afp").isNull()
    return fp.select(
        "media_id",
        "afp",
        F.when(bad, F.lit(True))
        .otherwise(F.col("media_id") == F.min("media_id").over(w))
        .alias("survivor"),
        F.when(bad, F.lit(1).cast("bigint"))
        .otherwise(F.count("*").over(w))
        .alias("group_size"),
    )


def video_frame_hashes(
    media: DataFrame, *, frame_len: int = 32, stride: int = 64
) -> DataFrame:
    """Distinct per-clip frame dHashes: sample frames (real decoder when
    ``av`` is present, fixed-bitrate byte windows otherwise), decode each
    frame, dHash it. Returns (media_id, frame_hash) distinct."""
    frames = sample_frame_payloads(media, frame_len=frame_len, stride=stride)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, fb in zip(pdf["media_id"], pdf["frame_bytes"]):
                ids.append(int(mid))
                hashes.append(dhash_kernel(decode_image(bytes(fb))))
            yield pd.DataFrame({"media_id": ids, "frame_hash": hashes})

    return (
        frames.select("media_id", "frame_bytes")
        .mapInPandas(run, "media_id bigint, frame_hash bigint")
        .distinct()
    )


def video_clip_dedup(
    media: DataFrame,
    *,
    frame_len: int = 32,
    stride: int = 64,
    jaccard_threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """Clip-level video dedup: two clips are near-duplicates when the
    Jaccard similarity of their frame-dHash SETS reaches the threshold —
    the shot-level containment signal frame-exact hashes can't give.

    Scale shape: frame hashes shuffle once keyed by hash to find clips
    sharing a frame (candidate pairs exist iff Jaccard > 0, so the join
    IS the candidate generator — no all-pairs); hashes appearing in more
    than ``max_df`` clips are dropped first (a black frame shared by
    every clip is non-discriminative and would explode the join — the
    standard df-cap from text retrieval). Intersections aggregate
    per-pair, Jaccard computes from exact set sizes, and the greater id
    of each qualifying pair drops.

    Returns surviving media rows.
    """
    # frame hashes materialized once: fh feeds the df-cap count, the
    # cap join, the per-clip sizes, AND both sides of the candidate
    # self-join — without the checkpoint each reference re-plans the
    # frame-decode + dHash Arrow kernel (no exchange reuse across a
    # Python node). The frame is clips × frames × (id, one long).
    fh = video_frame_hashes(
        media, frame_len=frame_len, stride=stride
    ).transform(materialize)
    df_count = fh.groupBy("frame_hash").agg(F.count("*").alias("__df"))
    keep_h = df_count.where(F.col("__df") <= max_df).select("frame_hash")
    fh = fh.join(keep_h, "frame_hash")
    sizes = fh.groupBy("media_id").agg(F.count("*").alias("__sz"))
    inter = (
        fh.alias("l")
        .join(
            fh.alias("r"),
            (F.col("l.frame_hash") == F.col("r.frame_hash"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .groupBy(
            F.col("l.media_id").alias("a"), F.col("r.media_id").alias("b")
        )
        .agg(F.count("*").alias("__inter"))
    )
    dropped = (
        inter.join(sizes.withColumnRenamed("media_id", "a"), "a")
        .withColumnRenamed("__sz", "__sza")
        .join(sizes.withColumnRenamed("media_id", "b"), "b")
        .where(
            F.col("__inter")
            / (F.col("__sza") + F.col("__sz") - F.col("__inter"))
            >= jaccard_threshold
        )
        .select(F.col("b").alias("media_id"))
        .distinct()
    )
    return media.join(dropped, on="media_id", how="left_anti")


def stream_image_candidate_pairs(
    media_stream: DataFrame,
    *,
    hash_size: int = 8,
    max_hamming: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """STREAMING near-dup image candidates: dHash per arriving image
    (the same Arrow decode kernel as the batch path — no extra state),
    Hamming block-permutation banding (max_hamming+1 blocks, pigeonhole
    guarantees a shared block within budget), then the shared keyed
    bucket-roster state (dedup.online_band_candidate_pairs) emits each
    candidate pair the moment its later member arrives. Drain + exact
    Hamming verification equals the batch image_near_dedup pair set —
    the image half of the online-LSH ingest contract."""
    from flink_psl_spark.llm.dedup import online_band_candidate_pairs

    blocks = max_hamming + 1
    width = 64 // blocks
    hashed = image_dhash(media_stream, hash_size=hash_size)
    banded = hashed.select(
        F.col("media_id").alias("__id"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(
                        F.col("dhash"), i * width
                    ).bitwiseAND(F.lit((1 << width) - 1))
                    for i in range(blocks)
                ]
            )
        ).alias("__band", "__bh"),
    )
    return online_band_candidate_pairs(banded, max_bucket=max_bucket)
