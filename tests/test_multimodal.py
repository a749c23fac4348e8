"""Multimodal binary-column plumbing tests: metadata sniffing stays JVM-side,
mapInPandas feature extraction batches correctly, corrupt payloads flow
through the in-band error channel, the real codec path is explicitly stubbed."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    real_decode,
    synthesize_media,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    return with_media_metadata(synthesize_media(spark, n=64)).cache()


def test_metadata_format_sniffing(media):
    by_kind = {
        r["kind"]: r["sniffed_format"]
        for r in media.filter("n_bytes > 0").select("kind", "sniffed_format").distinct().collect()
    }
    assert by_kind == {"image": "png", "audio": "riff", "video": "jpg"}


def test_metadata_is_jvm_only(media):
    # no BatchEvalPython / ArrowEvalPython in the metadata plan
    plan = media._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_feature_extraction_shapes(media):
    feats = extract_features(media, decode_fn=fake_decode)
    ok = feats.filter("error IS NULL").collect()
    assert ok and all(len(r["feature"]) == 16 for r in ok)
    for r in ok:
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # L1-normalized histogram


def test_corrupt_payloads_error_inband(media):
    feats = extract_features(media, decode_fn=fake_decode)
    bad = feats.filter("error IS NOT NULL").collect()
    assert bad and all(r["feature"] is None for r in bad)
    # stage did not fail; healthy + corrupt rows add up
    assert feats.count() == media.count()


def test_fake_decode_deterministic():
    payload = bytes(range(256))
    a = fake_decode(payload, "image")
    b = fake_decode(payload, "image")
    assert np.array_equal(a, b)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG....", "image")


def test_features_feed_similarity_ops(spark, media):
    """Decoded features are array<float> — directly usable by the embedding
    dedup/similarity operators (schema interop check)."""
    from dedupe_spark.operators.similarity import cosine_topk

    feats = (
        extract_features(media, decode_fn=fake_decode)
        .filter("error IS NULL")
        .select(F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding"))
        .cache()
    )
    out = cosine_topk(feats.limit(3), feats, k=4)
    assert out.groupBy("q_id").count().filter("count != 4").count() == 0


def test_resize_fixed_output_shape_and_error_channel(spark):
    from dedupe_spark.operators.multimodal import (
        fake_resize,
        resize_media,
        synthesize_media,
    )

    media = synthesize_media(spark, n=24)
    out = resize_media(media, out_w=4, out_h=4, resize_fn=fake_resize)
    rows = out.collect()
    assert len(rows) == 24
    ok = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    assert bad and all(r["pixels"] is None for r in bad)  # corrupt rows flow
    assert all(len(r["pixels"]) == 16 for r in ok)  # fixed out_w*out_h
    assert all(0.0 <= v <= 1.0 for r in ok for v in r["pixels"])


def test_resize_deterministic(spark):
    from dedupe_spark.operators.multimodal import resize_media, synthesize_media

    media = synthesize_media(spark, n=12)
    a = sorted(map(tuple, resize_media(media).collect()))
    b = sorted(map(tuple, resize_media(media).collect()))
    assert a == b


def test_frame_sampling_one_to_many_contract(spark):
    from dedupe_spark.operators.multimodal import sample_frames, synthesize_media

    media = synthesize_media(spark, n=24)
    n_videos = media.filter("kind = 'video'").count()
    out = sample_frames(media, n_frames=4)
    frames = out.filter("error is null").collect()
    # every healthy video yields exactly 4 frames that concatenate back
    # to the original payload (byte-exact coverage, no gaps/overlaps)
    per_vid = {}
    for r in frames:
        per_vid.setdefault(r["media_id"], []).append(r)
    assert len(per_vid) == n_videos
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("kind = 'video'").collect()
    }
    for vid, fr in per_vid.items():
        fr.sort(key=lambda r: r["frame_no"])
        assert [r["frame_no"] for r in fr] == list(range(4))
        assert b"".join(bytes(r["frame_payload"]) for r in fr) == payloads[vid]
    # non-video rows surface as single in-band error rows
    assert out.filter("error is not null").count() == 24 - n_videos


def _has_pillow() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _gradient(h=48, w=64) -> np.ndarray:
    return (np.arange(h * w, dtype=np.uint32) % 256).astype(np.uint8).reshape(h, w)


def test_bmp_codec_roundtrip_and_errors():
    """The vendored pure-python BMP codec: exact gray roundtrip (R=G=B
    payload makes the 601 luma the identity), top-down flag honored,
    truncation and non-BMP rejected."""
    from dedupe_spark.operators.multimodal import decode_bmp, encode_bmp

    grid = _gradient()
    bmp = encode_bmp(grid)
    assert np.array_equal(decode_bmp(bmp), grid)
    # negative height = top-down: flip the stored height sign and the
    # decoder must NOT flip the rows (stored order becomes logical order)
    neg = bytearray(bmp)
    neg[22:26] = (-grid.shape[0]).to_bytes(4, "little", signed=True)
    assert np.array_equal(decode_bmp(bytes(neg)), grid[::-1])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp[:-10])
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG nope" + bytes(64))
    with pytest.raises(ValueError, match="uncompressed"):
        bad = bytearray(bmp)
        bad[30:34] = (1).to_bytes(4, "little")  # RLE8 compression flag
        decode_bmp(bytes(bad))


def test_real_decode_bmp_through_spark(spark):
    """The REAL codec path runs in-sandbox (no Pillow needed): a BMP
    payload decodes through extract_features(decode_fn=real_decode) over
    mapInPandas into the exact 16-bin L1-normalized histogram of its
    true pixels; corrupt payloads take the in-band error channel."""
    from dedupe_spark.operators.multimodal import (
        encode_bmp,
        extract_features,
        real_decode,
    )

    grid = _gradient()
    bmp = encode_bmp(grid)
    media = spark.createDataFrame(
        [
            ("bmp0", "image", bytearray(bmp), 64, 48, None),
            ("trunc", "image", bytearray(bmp[:-10]), 64, 48, None),
            ("junk", "image", bytearray(b"not an image"), None, None, None),
        ],
        "media_id string, kind string, payload binary, "
        "width int, height int, sample_rate int",
    )
    rows = {
        r["media_id"]: r
        for r in extract_features(media, decode_fn=real_decode).collect()
    }
    ok = rows["bmp0"]
    assert ok["error"] is None
    hist = np.bincount(grid.ravel() >> 4, minlength=16).astype(np.float64)
    expected = (hist / hist.sum()).astype(np.float32)
    assert np.allclose(ok["feature"], expected, atol=1e-7)
    assert rows["trunc"]["error"] is not None
    assert "truncated" in rows["trunc"]["error"]
    assert rows["junk"]["error"] is not None  # NotImplemented or PIL error


@pytest.mark.skipif(not _has_pillow(), reason="Pillow not installed in this sandbox")
def test_real_decode_with_pillow(spark):
    """Exercises the REAL codec hook wherever Pillow exists: a generated
    PNG decodes through extract_features(decode_fn=real_decode) into the
    same (16,) L1-normalized feature contract as fake_decode."""
    import io as _io

    import numpy as np
    from PIL import Image

    from dedupe_spark.operators.multimodal import extract_features, real_decode

    buf = _io.BytesIO()
    Image.fromarray(
        (np.arange(64 * 48, dtype=np.uint32) % 256).astype(np.uint8).reshape(48, 64)
    ).save(buf, format="PNG")
    png = buf.getvalue()

    media = spark.createDataFrame(
        [("img0", "image", bytearray(png), 64, 48, None),
         ("bad0", "image", bytearray(b"not a png"), None, None, None)],
        "media_id string, kind string, payload binary, width int, height int, sample_rate int",
    )
    rows = {r["media_id"]: r for r in extract_features(media, decode_fn=real_decode).collect()}
    ok = rows["img0"]
    assert ok["error"] is None
    assert len(ok["feature"]) == 16
    assert abs(sum(ok["feature"]) - 1.0) < 1e-5
    assert rows["bad0"]["error"] is not None  # corrupt payload stays in-band


def test_real_decode_raises_cleanly_without_pillow(spark):
    """In codec-less environments the hook must fail loudly and the
    mapInPandas stage must keep it IN-BAND (error column, stage survives)."""
    from dedupe_spark.operators.multimodal import extract_features, real_decode, synthesize_media

    out = extract_features(synthesize_media(spark, n=6), decode_fn=real_decode)
    rows = out.collect()
    assert len(rows) == 6
    if not _has_pillow():
        assert all(r["error"] is not None for r in rows)


def test_fake_resize_single_output_sample():
    """out_w*out_h == 1 must return the first pixel (the linspace(n, 1)
    convention), not divide by zero."""
    import numpy as np

    from dedupe_spark.operators.multimodal import fake_resize

    out = fake_resize(bytes([10, 200, 30]), "img", 1, 1)
    assert out.shape == (1,) and out.dtype == np.float32
    assert abs(float(out[0]) - 10 / 255.0) < 1e-7
