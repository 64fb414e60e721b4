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


def test_real_decode_seam_raises(media):
    with pytest.raises(Exception) as exc:
        decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


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


def test_resize_real_seam_raises(media):
    from gridmr_spark.operators.multimodal import resize_images

    with pytest.raises(Exception) as exc:
        resize_images(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


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
