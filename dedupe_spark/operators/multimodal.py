"""Multimodal (image/audio/video) column plumbing.

A 100 TB training-data table carries media as opaque ``binary`` columns with
typed metadata. The Spark-side machinery here — schema, batch shape,
``mapInPandas`` iteration, partition sizing — is real and tested; the actual
codec calls (PIL/librosa/ffmpeg are not in this container) are stubbed
behind ``decode_fn`` with a clearly marked ``NotImplementedError`` default
and a deterministic fake for tests.

Design rules for binary columns at scale:
  * metadata (magic bytes, size, sha) is extracted with JVM builtins —
    ``substring`` on binary, ``octet_length``, ``sha2`` — so filters like
    "only PNGs under 10 MB" push down without touching Python.
  * heavy decode runs in ``mapInPandas`` so one Python worker streams Arrow
    batches; ``maxRecordsPerBatch`` bounds peak memory per batch.
  * decoded features come back as fixed-size ``array<float>`` + struct
    metadata — never Python objects.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("error", T.StringType()),
    ]
)

# magic-byte prefixes for format sniffing (JVM-side, pushdown-friendly)
MAGIC = {"png": bytes([0x89, 0x50, 0x4E, 0x47]), "riff": b"RIFF", "jpg": bytes([0xFF, 0xD8])}


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-only metadata projection: size, sha256, sniffed format.

    Everything here is codegen'd; a filter on ``sniffed_format`` prunes rows
    before any Python decode stage runs.
    """
    p = F.col(payload_col)
    fmt = (
        F.when(F.substring(p, 1, 4) == F.lit(MAGIC["png"]), "png")
        .when(F.substring(p, 1, 4) == F.lit(MAGIC["riff"]), "riff")
        .when(F.substring(p, 1, 2) == F.lit(MAGIC["jpg"]), "jpg")
        .otherwise("unknown")
    )
    return (
        df.withColumn("n_bytes", F.octet_length(p).cast("long"))
        .withColumn("payload_sha", F.sha2(p, 256))
        .withColumn("sniffed_format", fmt)
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-python decoder for uncompressed BMP (24-bit BGR or 8-bit) —
    a REAL image codec with zero dependencies, vendored so the
    ``real_decode`` plumbing has a non-fake integration path in
    codec-less environments (public format: the Windows BITMAPFILEHEADER
    / BITMAPINFOHEADER layout).

    Returns the grayscale pixel grid as ``uint8 (h, w)``. 24-bit rows
    are BGR with 4-byte row padding; luma uses the ITU-R 601 integer
    weights (299R + 587G + 114B) // 1000 (PIL's convert("L") formula).
    8-bit images are treated as direct intensity (the common grayscale
    palette) — palette indirection is out of scope for the hook.
    Negative height means top-down row order per the spec.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (8, 24):
        raise ValueError(
            f"only uncompressed 8/24-bit BMP supported "
            f"(bpp={bpp}, compression={compression})"
        )
    top_down, h = h < 0, abs(h)
    if w <= 0 or h == 0:
        raise ValueError("decoded image has zero pixels")
    row_size = ((bpp * w + 31) // 32) * 4
    if len(payload) < off + row_size * h:
        raise ValueError("truncated BMP pixel data")
    data = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=off
    ).reshape(h, row_size)
    if bpp == 24:
        bgr = data[:, : w * 3].reshape(h, w, 3).astype(np.uint32)
        gray = (
            (299 * bgr[..., 2] + 587 * bgr[..., 1] + 114 * bgr[..., 0])
            // 1000
        ).astype(np.uint8)
    else:
        gray = data[:, :w].copy()
    return gray if top_down else gray[::-1]


def encode_bmp(gray: "np.ndarray") -> bytes:
    """Minimal 24-bit uncompressed BMP writer (bottom-up, R=G=B=value) —
    the deterministic test-fixture counterpart of :func:`decode_bmp`;
    round-trips exactly through it."""
    arr = np.asarray(gray, dtype=np.uint8)
    if arr.ndim != 2 or arr.size == 0:
        raise ValueError("encode_bmp expects a non-empty (h, w) array")
    h, w = arr.shape
    row_size = ((24 * w + 31) // 32) * 4
    body = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up: last array row first; BGR triplets all equal to gray
    flipped = arr[::-1]
    for c in range(3):
        body[:, c : w * 3 : 3] = flipped
    off = 14 + 40
    size = off + row_size * h
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (row_size * h).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + body.tobytes()


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Real codec hook: vendored pure-python BMP decode for ``BM``
    payloads (runs everywhere, incl. this sandbox — integration-tested
    through the full mapInPandas path), PIL for every other image format
    wherever Pillow exists.

    Feature = 16-bin intensity histogram over the decoded grayscale
    pixels, L1-normalized — the same (16,) float32 shape contract as
    ``fake_decode``, so the Spark-side plumbing (schema, mapInPandas
    batches, error channel) is byte-for-byte identical whichever decoder
    runs. Audio/video kinds would need librosa/av wrappers. In codec-less
    environments (no Pillow) non-BMP images surface NotImplementedError;
    the skipif-gated test
    ``tests/test_multimodal.py::test_real_decode_with_pillow`` arms the
    PIL path wherever Pillow is installed, so the hook cannot rot
    silently.
    """
    if kind == "image":
        if payload[:2] == b"BM":
            arr = decode_bmp(payload)
        else:
            try:
                from PIL import Image  # noqa: PLC0415 — optional codec
            except ImportError as e:
                raise NotImplementedError(
                    "Pillow is not installed in this environment; use an "
                    "uncompressed BMP payload (vendored decoder), pass "
                    "decode_fn=fake_decode, or install Pillow"
                ) from e
            import io

            img = Image.open(io.BytesIO(payload)).convert("L")
            arr = np.asarray(img, dtype=np.uint8)
        if arr.size == 0:
            raise ValueError("decoded image has zero pixels")
        hist = np.bincount(arr.ravel() >> 4, minlength=16).astype(np.float64)
        return (hist / hist.sum()).astype(np.float32)
    raise NotImplementedError(
        f"no codec wrapper for kind={kind!r} (librosa/av not installed); "
        "pass decode_fn=fake_decode or a real codec wrapper"
    )


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: 16-bin byte histogram, L1-normalized.

    Shape-compatible with a real embedding extractor (fixed-size float
    vector per row) so downstream similarity/dedup operators run unchanged.
    """
    if not payload:
        raise ValueError("empty payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """Decode/feature-extract stage over ``mapInPandas`` Arrow batches.

    Per-row errors are captured in-band (error column, null ⇔ ok) — the
    reference's corrupt-file convention (hash_generator.py:102-114): a bad
    payload never fails the stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats: list[list[float] | None] = []
            errs: list[str | None] = []
            sizes: list[int] = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                # n_bytes inside the per-row try too: a NULL payload must
                # become an error row, never fail the stage (in-band
                # error contract, hash_generator.py:102-114)
                try:
                    sizes.append(len(payload) if payload is not None else 0)
                    feats.append(decode_fn(bytes(payload), kind).tolist())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — in-band error channel
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "feature": feats,
                    "error": errs,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks (no external data).

    Payloads carry real magic bytes so format sniffing is non-trivial;
    every third row is corrupt (empty payload) to exercise the error channel.
    """
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if i % 3 == 0 and i % 9 == 0:
            payload = b""
        else:
            magic = {"image": MAGIC["png"], "audio": MAGIC["riff"], "video": MAGIC["jpg"]}[kind]
            body = rng.integers(0, 256, size=64 + (i % 7) * 16, dtype=np.uint8)
            payload = magic + body.tobytes()
        rows.append(
            (
                f"m{i:04d}",
                kind,
                bytearray(payload),
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                16000 if kind == "audio" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


if __name__ == "__main__":  # library smoke (SURVEY §3.3 per-module CLI)
    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="multimodal_smoke", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    media = with_media_metadata(synthesize_media(spark, n=32))
    feats = extract_features(media, decode_fn=fake_decode)
    media.groupBy("sniffed_format").count().orderBy("sniffed_format").show()
    print("error rows:", feats.filter("error is not null").count())


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
        T.StructField("error", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def fake_resize(payload: bytes, kind: str, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic stand-in for an image resize: decode the payload to a
    1-D intensity signal and linearly resample it to out_w*out_h values —
    shape-compatible with a real ``PIL.Image.resize`` wrapper.

    The interpolation is written as explicit IEEE-754 double ops (floor
    index, fractional lerp, single final float32 cast) rather than
    ``np.interp`` so an independent SQL engine can replicate it
    bit-for-bit — the ``media_resize`` DuckDB oracle recomputes the same
    formula from the raw payload bytes and the values hash-match."""
    if not payload:
        raise ValueError("empty payload")
    b = np.frombuffer(payload, dtype=np.uint8)
    n = len(b)
    src = b.astype(np.float64) / 255.0
    m = out_w * out_h
    if n == 1:
        return np.full(m, src[0], dtype=np.float32)
    if m == 1:
        # single output sample: np.linspace(0, n-1, 1) == [0.0], i.e. the
        # first pixel — guard the (m-1) division below, mirroring n == 1
        return src[:1].astype(np.float32)
    delta = (n - 1) / (m - 1)
    idx = np.arange(m, dtype=np.float64) * delta
    idx[-1] = n - 1  # pin the endpoint exactly (linspace convention)
    lo = np.floor(idx).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = idx - lo
    return (src[lo] + frac * (src[hi] - src[lo])).astype(np.float32)


def resize_media(
    media: DataFrame,
    *,
    out_w: int = 8,
    out_h: int = 8,
    resize_fn: Callable[[bytes, str, int, int], np.ndarray] = fake_resize,
) -> DataFrame:
    """Resize stage over ``mapInPandas`` — one fixed-size pixel array out
    per row in; errors in-band (the stage never fails on a bad payload).

    Swap ``resize_fn`` for a PIL/cv2 wrapper on a cluster with codecs; the
    Spark-side contract (schema, Arrow batching, error channel) is
    identical and is what the tests pin down.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pix: list[list[float] | None] = []
            errs: list[str | None] = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    arr = resize_fn(
                        bytes(payload) if payload is not None else b"",
                        kind,
                        out_w,
                        out_h,
                    )
                    pix.append(arr.tolist())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — in-band error channel
                    pix.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "pixels": pix,
                    "error": errs,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage: one input row → up to ``n_frames`` output rows
    (evenly spaced byte-range "frames" of the payload — the deterministic
    stand-in for an ffmpeg keyframe extractor; a real wrapper swaps the
    slicing for decoded frames with the SAME 1→N row contract).

    The 1→N explosion happens inside ``mapInPandas`` so output batch sizes
    stay Arrow-bounded; non-video rows pass through as a single error row
    (shape-stable output for downstream unions).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "frame_no": [], "frame_payload": [],
                "n_frame_bytes": [], "error": [],
            }
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if kind != "video":
                    out["media_id"].append(media_id)
                    out["frame_no"].append(-1)
                    out["frame_payload"].append(None)
                    out["n_frame_bytes"].append(0)
                    out["error"].append(f"not a video: kind={kind}")
                    continue
                if not raw:
                    out["media_id"].append(media_id)
                    out["frame_no"].append(-1)
                    out["frame_payload"].append(None)
                    out["n_frame_bytes"].append(0)
                    out["error"].append("empty payload")
                    continue
                k = min(n_frames, len(raw))
                bounds = [len(raw) * i // k for i in range(k + 1)]
                for f in range(k):
                    chunk = raw[bounds[f] : bounds[f + 1]]
                    out["media_id"].append(media_id)
                    out["frame_no"].append(f)
                    out["frame_payload"].append(chunk)
                    out["n_frame_bytes"].append(len(chunk))
                    out["error"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)
