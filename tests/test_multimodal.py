"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake decode
values vs a pure-Python reference, frame sampling, and the NotImplementedError
seam for the real codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridmr_spark.operators.multimodal import (
    IMAGE_FEATURES,
    attach_payload,
    decode_image_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").limit(50)
    return attach_payload(docs, "doc_id", "text")


def test_payload_schema(media):
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<kind:string,mime:string,width:int")


def test_decode_matches_python_reference(spark, sf_oracle, media):
    out = decode_image_features(media).collect()
    assert {f.name for f in IMAGE_FEATURES.fields} == set(out[0].asDict())
    texts = {r.doc_id: r.text for r in
             spark.read.parquet(f"{sf_oracle}/documents.parquet").limit(50).collect()}
    for r in out:
        b = texts[r.doc_id].encode("utf-8")
        assert r.byte_len == len(b)
        assert abs(r.mean_byte - sum(b) / len(b)) < 1e-12
        assert r.feature == [float(sum(1 for x in b if x % 8 == i)) for i in range(8)]


def test_decode_partition_invariant(media):
    a = sorted(r.doc_id for r in decode_image_features(media).collect())
    b = sorted(r.doc_id for r in decode_image_features(media.repartition(7)).collect())
    assert a == b


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_have_pil(), reason="PIL present: the seam decodes instead of raising")
def test_real_decode_seam_raises_for_non_png(media):
    """fake=False on NON-PNG payloads (these are raw text bytes) still needs
    PIL — the stdlib decoder only claims the PNG format."""
    with pytest.raises(Exception) as exc:
        decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_png_codec_roundtrip_all_filters():
    """Pure-stdlib PNG codec: every scanline filter type (0-4) must decode
    back to the original pixels, on random and adversarial arrays."""
    import numpy as np

    from gridmr_spark.operators.multimodal import png_decode_gray, png_encode_gray

    rng = np.random.RandomState(11)
    cases = [
        rng.randint(0, 256, (23, 16)).astype(np.uint8),
        np.zeros((5, 7), np.uint8),
        np.full((4, 4), 255, np.uint8),
        np.arange(256, dtype=np.uint8).reshape(16, 16),
        rng.randint(0, 256, (1, 1)).astype(np.uint8),
    ]
    for a in cases:
        h = a.shape[0]
        for filters in (None, [0] * h, [1] * h, [2] * h, [3] * h, [4] * h):
            got = png_decode_gray(png_encode_gray(a, filters))
            assert (got == a).all()


def test_png_decoder_reads_independent_writer():
    """Cross-writer check: the decoder must read PNGs from the test suite's
    own independent stdlib writer (filter 0 only), not just its paired
    encoder."""
    import numpy as np

    from gridmr_spark.operators.multimodal import png_decode_gray

    png = _png_gray(bytes(range(64)), 8, 8)
    got = png_decode_gray(png)
    assert (got == np.arange(64, dtype=np.uint8).reshape(8, 8)).all()


def _png_gray(pixels: bytes, w: int, h: int) -> bytes:
    """Minimal 8-bit grayscale PNG writer — pure stdlib (zlib + struct), so
    the test can CREATE a real PNG without any codec library; only reading
    it back needs PIL."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # depth 8, color 0 = gray
    raw = b"".join(b"\x00" + pixels[y * w : (y + 1) * w] for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_decode_roundtrips_png(spark):
    """fake=False must decode ACTUAL image bytes through the same
    mapInPandas plumbing — via the stdlib PNG decoder, so this runs in
    codec-less containers too (PIL, when present, is only used for non-PNG
    formats): an 8x8 gray PNG with pixels 0..63 decodes to width/height 8,
    mean 31.5, and a uniform mod-8 histogram."""
    from gridmr_spark.operators.multimodal import MEDIA_META, resize_images

    png = _png_gray(bytes(range(64)), 8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(png), ("image", "image/png", 8, 8, 16000, 1))],
        schema=f"doc_id long, payload binary, meta struct<{','.join(f'{f.name}:{f.dataType.simpleString()}' for f in MEDIA_META.fields)}>",
    )
    r = decode_image_features(df, fake=False).collect()[0]
    assert (r.width, r.height) == (8, 8)
    assert r.byte_len == len(png)
    assert abs(r.mean_byte - 31.5) < 1e-12
    assert r.feature == [8.0] * 8
    rz = resize_images(df, width=4, height=4, fake=False).collect()[0]
    assert (rz.out_width, rz.out_height) == (4, 4)
    assert len(rz.resized) == 16
    assert all(0 <= b <= 63 for b in rz.resized)  # nearest-neighbor keeps source pixels


def test_frame_sampling(media):
    frames = sample_frames(media, every_nth=5)
    rows = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    metas = {r.doc_id: r.n_frames for r in media.select("doc_id", "meta.n_frames").collect()}
    for r in rows:
        expected = (metas[r.doc_id] + 4) // 5  # ceil(n_frames/5)
        assert r.n == expected


def test_resize_stub_semantics(spark, media):
    """The fake resize must emit exactly width*height bytes per row, derived
    deterministically from the payload (byte subsampling — the PIL seam
    swaps in without touching schema or batching)."""
    from gridmr_spark.operators.multimodal import resize_images

    out = {r.doc_id: r for r in resize_images(media, 16, 8).collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in media.select("doc_id", "payload").collect()}
    assert len(out) == len(payloads)
    for doc_id, r in out.items():
        assert (r.out_width, r.out_height) == (16, 8)
        assert len(r.resized) == 16 * 8
        b = payloads[doc_id]
        step = max(1, len(b) // (16 * 8))
        expect = b[::step][: 16 * 8]
        assert bytes(r.resized).rstrip(b"\x00")[: len(expect)] == expect.rstrip(b"\x00")[: len(expect)] or bytes(r.resized)[: len(expect)] == expect


@pytest.mark.skipif(_have_pil(), reason="PIL present: the seam decodes instead of raising")
def test_resize_real_seam_raises_for_non_png(media):
    from gridmr_spark.operators.multimodal import resize_images

    with pytest.raises(Exception) as exc:
        resize_images(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_encode_png_media_real_payloads(spark, sf_oracle):
    """encode_png_media emits genuine PNGs (signature + decoder roundtrip):
    pixel bytes must equal the document's first (n//16)*16 utf-8 bytes."""
    import numpy as np

    from gridmr_spark.operators.multimodal import encode_png_media, png_decode_gray

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").limit(20)
    texts = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    rows = encode_png_media(docs, "doc_id", "text", width=16).collect()
    assert rows and all(bytes(r.payload).startswith(b"\x89PNG\r\n\x1a\n") for r in rows)
    for r in rows:
        b = texts[r.doc_id]
        h = len(b) // 16
        arr = png_decode_gray(bytes(r.payload))
        assert arr.shape == (h, 16) == (r.meta.height, r.meta.width)
        assert arr.tobytes() == b[: h * 16]


def test_arrow_byte_stats_sliced_batch():
    """Regression: on a SLICED binary array the values buffer must be
    truncated to offsets[-1], or the last row's reduceat segment runs into
    bytes belonging to rows beyond the slice (sum/max inflated)."""
    import pyarrow as pa

    from gridmr_spark.operators.multimodal import _arrow_byte_stats_batches

    ids = pa.array([10, 11, 12], type=pa.int64())
    pay = pa.array([b"\x07\x07", b"\x30\x31", b"\x40\x40\x40"], type=pa.binary())
    full = pa.RecordBatch.from_arrays([ids, pay], names=["doc_id", "payload"])
    sliced = full.slice(1, 1)  # row 11 only: payload 0x30 0x31
    (out,) = list(_arrow_byte_stats_batches([sliced]))
    r = out.to_pylist()[0]
    assert r == {
        "doc_id": 11,
        "byte_len": 2,
        "byte_sum": 0x30 + 0x31,
        "min_byte": 0x30,
        "max_byte": 0x31,
    }
    # Unsliced parity: every row exact.
    (out_full,) = list(_arrow_byte_stats_batches([full]))
    assert [r["byte_sum"] for r in out_full.to_pylist()] == [14, 97, 192]


def test_audio_frame_energy_matches_python_reference(spark, sf_smoke):
    """Frame energies must equal a pure-Python recomputation over the raw
    payload bytes, and the fake=False path must raise at the codec seam."""
    import pytest
    from pyspark.sql import functions as F
    from gridmr_spark.catalog import load_table
    from gridmr_spark.operators.multimodal import attach_payload, audio_frame_energy

    docs = load_table(spark, sf_smoke, "documents").where(F.col("doc_id") < 20)
    media = attach_payload(docs, "doc_id", "text", kind="audio")
    got = {
        (r.doc_id, r.frame_idx): r.energy
        for r in audio_frame_energy(media, frame_bytes=64).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        b = r.text.encode("utf-8")
        for i in range(len(b) // 64):
            frame = b[i * 64 : (i + 1) * 64]
            want[(r.doc_id, i)] = sum((x - 128) ** 2 for x in frame)
    assert got == want and len(want) > 0
    with pytest.raises(Exception, match="NotImplementedError|real audio"):
        audio_frame_energy(media, fake=False).collect()


def test_wav_roundtrip_real_container(spark, sf_smoke):
    """encode_wav_media writes genuine RIFF/WAVE (stdlib wave re-opens it:
    mono, 1-byte samples, the requested rate) and wav_frame_energy's parse
    agrees byte-for-byte with the raw-byte energy path on the same data."""
    import io
    import wave

    from gridmr_spark.operators.multimodal import (
        attach_payload,
        audio_frame_energy,
        encode_wav_media,
        wav_frame_energy,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    media = encode_wav_media(docs, "doc_id", "text", sample_rate=8000)
    one = media.limit(1).collect()[0]
    with wave.open(io.BytesIO(bytes(one.payload)), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 1, 8000)
    via_wav = {
        (r.doc_id, r.frame_idx): r.energy
        for r in wav_frame_energy(media, frame_samples=256).collect()
    }
    raw = attach_payload(docs, "doc_id", "text", kind="audio")
    via_bytes = {
        (r.doc_id, r.frame_idx): r.energy
        for r in audio_frame_energy(raw, frame_bytes=256).collect()
    }
    assert via_wav == via_bytes and len(via_wav) > 0


class TestJpegCodec:
    """Baseline JPEG codec (operators/jpeg.py): exactness on block-constant
    content (the oracle's regime), PSNR floor on arbitrary content (proof
    it is a real codec), and interop with PIL when present."""

    def test_block_constant_roundtrip_exact(self):
        import numpy as np

        from gridmr_spark.operators.jpeg import jpeg_decode_gray, jpeg_encode_gray

        rng = np.random.RandomState(7)
        vals = rng.randint(0, 256, size=(5, 16)).astype(np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        assert np.array_equal(jpeg_decode_gray(jpeg_encode_gray(img)), img)

    def test_arbitrary_content_psnr_floor(self):
        import numpy as np

        from gridmr_spark.operators.jpeg import jpeg_decode_gray, jpeg_encode_gray

        rng = np.random.RandomState(3)
        for img in (
            rng.randint(0, 256, size=(32, 40)).astype(np.uint8),  # worst case
            (
                np.sin(np.linspace(0, 12, 64))[:, None]
                * np.cos(np.linspace(0, 9, 48))[None, :]
                * 100
                + 128
            ).astype(np.uint8),  # smooth, realistic
        ):
            dec = jpeg_decode_gray(jpeg_encode_gray(img))
            mse = ((dec.astype(float) - img) ** 2).mean()
            psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
            assert psnr >= 30.0, f"PSNR {psnr:.1f} below floor"

    def test_dims_must_be_multiple_of_8(self):
        import numpy as np
        import pytest

        from gridmr_spark.operators.jpeg import jpeg_encode_gray

        with pytest.raises(ValueError, match="divisible by 8"):
            jpeg_encode_gray(np.zeros((10, 16), dtype=np.uint8))

    def test_interop_with_pil_if_present(self):
        import numpy as np
        import pytest

        from gridmr_spark.operators.jpeg import jpeg_encode_gray

        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        vals = np.arange(128, dtype=np.uint8).reshape(8, 16)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        pil_dec = np.asarray(
            PIL_Image.open(io.BytesIO(jpeg_encode_gray(img))).convert("L")
        )
        assert np.array_equal(pil_dec, img)  # lossless regime: PIL agrees

    def test_decode_image_features_jpeg_path(self, spark, sf_smoke):
        import numpy as np

        from gridmr_spark.operators.multimodal import (
            decode_image_features,
            encode_jpeg_media,
        )

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(20)
        feats = decode_image_features(
            encode_jpeg_media(docs, "doc_id", "text"), fake=False
        ).collect()
        raw = {r.doc_id: r.text.encode() for r in docs.collect()}
        assert feats
        for r in feats:
            b = raw[r.doc_id]
            n = (len(b) // 16) * 16
            assert (r.width, r.height) == (128, (n // 16) * 8)
            assert abs(r.mean_byte - sum(b[:n]) / n) < 1e-12
            want_hist = np.bincount(
                np.frombuffer(b, np.uint8, count=n) & 7, minlength=8
            ) * 64
            assert [int(x) for x in r.feature] == want_hist.tolist()
