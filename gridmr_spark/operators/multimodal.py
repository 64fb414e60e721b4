"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for 100 TB media pipelines: the payload travels as a `binary`
column (or a reference/URI for very large blobs), typed metadata rides in a
struct, and decode / feature-extraction runs as Arrow-batched pandas
iterators (mapInPandas) so the Python crossing is per-batch, not per-row.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is stubbed: `fake=True` (default) derives deterministic features
from the bytes themselves (schema/partitioning/batch plumbing fully real);
`fake=False` raises NotImplementedError at the exact seam where the codec
call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),    # image/video
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("n_frames", T.IntegerType()),     # video/audio
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media column for tests/benchmarks: payload =
    utf-8 bytes of the text, metadata derived with modular arithmetic. The
    downstream plumbing cannot tell it from real media."""
    payload = F.encode(F.col(text_col), "utf-8")
    blen = F.length(payload)
    meta = F.struct(
        F.lit(kind).alias("kind"),
        F.lit(f"{kind}/x-fake").alias("mime"),
        (blen % 640 + 16).cast("int").alias("width"),
        (blen % 480 + 16).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (blen % 30 + 1).cast("int").alias("n_frames"),
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("meta"))


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (zlib + struct + numpy): 8-bit grayscale, all five
# scanline filters, no interlace. Public format per the PNG spec (RFC 2083).
# This removes the PIL dependency from the REAL decode path for PNG payloads,
# so real-codec evidence runs in codec-less containers; PIL remains the seam
# for every other format.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode_gray(arr, filters=None) -> bytes:
    """Encode an (h, w) uint8 array as an 8-bit grayscale PNG. ``filters``
    picks the per-scanline filter type (default y % 5, cycling through all
    five so a decode roundtrip exercises every unfilter branch)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape
    if h < 1 or w < 1:
        raise ValueError("png_encode_gray needs a non-empty array")
    # No ENCODER-side filter has a reconstruction dependency (left/prior/ul
    # all come from the ORIGINAL pixel array), so every scanline's filtered
    # bytes compute in one whole-image numpy pass: build the five filter
    # variants as (h, w) arrays and pick per row. Byte-identical to the
    # per-scanline loop this replaces (same int arithmetic, same mod 256).
    cur = arr.astype(np.int32)
    left = np.zeros_like(cur)
    left[:, 1:] = cur[:, :-1]
    prior = np.zeros_like(cur)
    prior[1:, :] = cur[:-1, :]
    ul = np.zeros_like(cur)
    ul[:, 1:] = prior[:, :-1]
    p = left + prior - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
    variants = np.stack(
        [cur, cur - left, cur - prior, cur - ((left + prior) >> 1), cur - pred]
    )  # (5, h, w)
    fidx = (
        (np.arange(h) % 5) if filters is None else np.asarray(filters, dtype=np.int64)
    )
    if fidx.min() < 0 or fidx.max() > 4:
        raise ValueError(f"unknown PNG filter {int(fidx.min()) if fidx.min() < 0 else int(fidx.max())}")
    lines = np.empty((h, w + 1), dtype=np.uint8)
    lines[:, 0] = fidx
    lines[:, 1:] = (variants[fidx, np.arange(h), :] % 256).astype(np.uint8)
    raw = lines.tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def png_decode_gray(data: bytes):
    """Decode an 8-bit grayscale non-interlaced PNG to an (h, w) uint8 array
    using only stdlib zlib/struct + numpy (Sub unfilters as a cumsum; Up as a
    vector add; Average/Paeth walk the scanline with numpy scalars)."""
    import struct
    import zlib

    import numpy as np

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, w = len(_PNG_SIG), None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, comp, filt_m, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, color, comp, filt_m, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "png_decode_gray supports 8-bit grayscale non-interlaced only "
                    f"(got depth={depth} color={color} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (w + 1):
        raise ValueError(f"PNG payload size mismatch: {len(raw)} != {h}*({w}+1)")
    out = np.zeros((h, w), dtype=np.uint8)
    prior = np.zeros(w, dtype=np.int64)
    for y in range(h):
        f = raw[y * (w + 1)]
        line = np.frombuffer(raw, np.uint8, count=w, offset=y * (w + 1) + 1).astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub, bpp=1: recon = running sum of filtered bytes
            rec = np.cumsum(line) % 256
        elif f == 2:
            rec = (line + prior) % 256
        elif f == 3:
            # Sequential reconstruction (left depends on the previous
            # pixel) — run the scan over PYTHON ints: per-element numpy
            # scalar indexing/arithmetic is ~10x slower than int ops.
            ln, pr, out_row = line.tolist(), prior.tolist(), []
            left = 0
            for x in range(w):
                left = (ln[x] + ((left + pr[x]) >> 1)) % 256
                out_row.append(left)
            rec = np.asarray(out_row, dtype=np.int64)
        elif f == 4:
            ln, pr, out_row = line.tolist(), prior.tolist(), []
            left = 0
            for x in range(w):
                left = (ln[x] + _paeth(left, pr[x], pr[x - 1] if x else 0)) % 256
                out_row.append(left)
            rec = np.asarray(out_row, dtype=np.int64)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out


def _decode_gray_any(b: bytes, pil_image_mod):
    """Decode payload bytes to an (h, w) uint8 grayscale array: PNGs go
    through the deterministic stdlib decoder (container-independent); every
    other format needs PIL and raises NotImplementedError without it."""
    import io

    import numpy as np

    b = bytes(b)
    if b.startswith(_PNG_SIG):
        return png_decode_gray(b)
    if b.startswith(b"\xff\xd8"):
        from gridmr_spark.operators.jpeg import jpeg_decode_gray

        return jpeg_decode_gray(b)
    if pil_image_mod is None:
        raise NotImplementedError(
            "real decode of non-PNG/JPEG formats requires PIL; install pillow or use fake=True"
        )
    im = pil_image_mod.open(io.BytesIO(b)).convert("L")
    return np.asarray(im, dtype=np.uint8).reshape(im.height, im.width)


def encode_png_media(
    df: DataFrame, id_col: str, text_col: str, width: int = 16
) -> DataFrame:
    """Deterministic REAL-format media builder: pack each document's utf-8
    bytes into an 8-bit grayscale PNG (h = n_bytes // width full scanlines,
    filter type cycling y % 5 so every PNG filter appears in the corpus).
    Rows shorter than one scanline are dropped — mirrored by the oracle's
    WHERE clause. Arrow-batched mapInPandas; the payload is a genuine PNG
    any external tool can open."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                b = text.encode("utf-8")
                h = len(b) // width
                if h == 0:
                    continue
                arr = np.frombuffer(b, np.uint8, count=h * width).reshape(h, width)
                ids.append(doc_id)
                payloads.append(png_encode_gray(arr))
                metas.append(
                    {
                        "kind": "image",
                        "mime": "image/png",
                        "width": width,
                        "height": h,
                        "sample_rate": 16000,
                        "n_frames": 1,
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype=object),
                    "meta": pd.Series(metas, dtype=object),
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode_batches, schema=out_schema)


def encode_jpeg_media(
    df: DataFrame, id_col: str, text_col: str, blocks_per_row: int = 16
) -> DataFrame:
    """Deterministic REAL-format JPEG media builder: each document byte
    becomes one CONSTANT 8x8 block (blocks_per_row blocks per row, so the
    image is 8*blocks_per_row wide), encoded as a genuine baseline JFIF
    JPEG (operators/jpeg.py). Block-constant content + DC quantization
    step 8 makes the lossy codec EXACTLY lossless here (see jpeg.py
    docstring), which is what lets the DuckDB oracle re-derive decoded
    pixel statistics straight from the text bytes. Rows shorter than one
    block row are dropped — mirrored by the oracle's WHERE clause."""
    import numpy as np

    from gridmr_spark.operators.jpeg import jpeg_encode_gray

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                b = text.encode("utf-8")
                rows = len(b) // blocks_per_row
                if rows == 0:
                    continue
                vals = np.frombuffer(
                    b, np.uint8, count=rows * blocks_per_row
                ).reshape(rows, blocks_per_row)
                img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                ids.append(doc_id)
                payloads.append(jpeg_encode_gray(img))
                metas.append(
                    {
                        "kind": "image",
                        "mime": "image/jpeg",
                        "width": 8 * blocks_per_row,
                        "height": 8 * rows,
                        "sample_rate": 16000,
                        "n_frames": 1,
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype=object),
                    "meta": pd.Series(metas, dtype=object),
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode_batches, schema=out_schema)


def _try_pil_image():
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_image_features(media: DataFrame, batch_size: int = 256, fake: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction over the payload column.

    mapInPandas: each task pulls Arrow batches, decodes in bulk, emits a
    feature frame — the Python boundary is crossed once per batch. Executor
    memory bounds the working set via spark.sql.execution.arrow.
    maxRecordsPerBatch, not per-row allocation.
    """

    import numpy as np

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _try_pil_image() if not fake else None
        for pdf in batches:
            payloads = pdf["payload"]
            if not fake:
                # Real path: JPEG payloads decode as ONE lockstep batch
                # (jpeg_decode_gray_many — the bit-serial Huffman walk is
                # vectorized ACROSS the images of the Arrow batch); PNG and
                # PIL formats stay per-image. ALL pixel math is numpy over
                # the decoded array — the same stats as the fake path,
                # computed on pixels instead of raw payload bytes.
                payload_bytes = [bytes(b) for b in payloads]
                arrays: list = [None] * len(payload_bytes)
                jpg = [i for i, b in enumerate(payload_bytes) if b.startswith(b"\xff\xd8")]
                if jpg:
                    from gridmr_spark.operators.jpeg import jpeg_decode_gray_many

                    for i, arr in zip(jpg, jpeg_decode_gray_many([payload_bytes[i] for i in jpg])):
                        arrays[i] = arr
                widths, heights, means, feats = [], [], [], []
                for b, arr in zip(payload_bytes, arrays):
                    if arr is None:
                        arr = _decode_gray_any(b, pil)
                    heights.append(arr.shape[0])
                    widths.append(arr.shape[1])
                    flat = arr.ravel()
                    means.append(float(flat.sum(dtype="int64")) / len(flat) if len(flat) else 0.0)
                    feats.append(np.bincount(flat & 7, minlength=8).astype("float64").tolist())
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "byte_len": payloads.map(len).astype("int64"),
                        "width": pd.Series(widths, index=pdf.index, dtype="int32"),
                        "height": pd.Series(heights, index=pdf.index, dtype="int32"),
                        "mean_byte": pd.Series(means, index=pdf.index, dtype="float64"),
                        "feature": pd.Series(feats, index=pdf.index),
                    }
                )
                continue

            # Fake (container-default) path: numpy frombuffer + bincount per
            # payload — byte-exact with the DuckDB oracle's definitions
            # (integer sums are exact in int64, so sum/len is the same
            # double), with no per-byte interpreted Python.
            def _stats(b: bytes) -> tuple[float, list[float]]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    return 0.0, [0.0] * 8
                mean = float(arr.sum(dtype="int64")) / len(arr)
                return mean, np.bincount(arr & 7, minlength=8).astype("float64").tolist()

            stats = [_stats(b) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "mean_byte": pd.Series([s[0] for s in stats], index=pdf.index, dtype="float64"),
                    "feature": pd.Series([s[1] for s in stats], index=pdf.index),
                }
            )

    # batch_size is advisory: spark.sql.execution.arrow.maxRecordsPerBatch
    # controls the Arrow chunking — set it at session level, not here (a
    # per-operator global conf mutation would leak into unrelated queries).
    del batch_size
    return media.mapInPandas(decode_batches, schema=IMAGE_FEATURES)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Arrow-batched image resize over the payload column (mapInPandas, same
    seam as decode_image_features). `fake=True` (the in-container default)
    "resizes" by deterministic byte subsampling to width*height bytes —
    schema, batching, and output-size semantics are fully real, so swapping
    in PIL's `Image.resize` at the marked seam changes no plumbing.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height
        pil = _try_pil_image() if not fake else None

        def real_resize(b: bytes) -> bytes:
            # Decode (stdlib for PNG, PIL otherwise), then deterministic
            # floor-convention nearest-neighbor via numpy fancy indexing —
            # identical output with or without PIL in the container.
            arr = _decode_gray_any(b, pil)
            in_h, in_w = arr.shape
            ys = (np.arange(height, dtype=np.int64) * in_h) // height
            xs = (np.arange(width, dtype=np.int64) * in_w) // width
            return arr[np.ix_(ys, xs)].tobytes()

        for pdf in batches:
            if not fake:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "out_width": width,
                        "out_height": height,
                        # raw grayscale pixel bytes of the resized image —
                        # exactly width*height bytes, like the fake path
                        "resized": pdf["payload"].map(real_resize),
                    }
                )
                continue

            def subsample(b: bytes) -> bytes:
                if len(b) == 0:
                    return b"\x00" * target
                step = max(1, len(b) // target)
                out = b[::step][:target]
                return out + b"\x00" * (target - len(out))

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": width,
                    "out_height": height,
                    "resized": pdf["payload"].map(subsample),
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


AUDIO_FRAMES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_frame_energy(media: DataFrame, frame_bytes: int = 256, fake: bool = True) -> DataFrame:
    """Arrow-batched audio feature extraction: the payload is framed into
    fixed-size windows and each frame emits its energy (sum of squared
    centered samples) — the VAD/segmentation primitive. `fake=True` (the
    in-container default) treats payload bytes as 8-bit PCM samples
    (sample - 128, integer squares — deterministic, oracle-exact);
    `fake=False` raises at the seam where a real codec (librosa/ffmpeg
    decode to PCM) plugs in. Each row expands to floor(len/frame_bytes)
    frame rows inside the same Arrow batch — the Python boundary is crossed
    once per batch, and frames of a pathological hours-long payload stay
    bounded by the batch's own row count, not materialized per-frame
    Python objects."""
    import numpy as np

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio path: decode payload to PCM (librosa/ffmpeg), then frame"
                )
            ids, idxs, energies = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_bytes
                if n_frames == 0:
                    continue
                samples = np.frombuffer(payload[: n_frames * frame_bytes], dtype=np.uint8)
                centered = samples.astype("int64") - 128
                e = (centered * centered).reshape(n_frames, frame_bytes).sum(axis=1)
                ids.extend([doc_id] * n_frames)
                idxs.extend(range(n_frames))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return media.mapInPandas(frame_batches, schema=AUDIO_FRAMES)


def sample_frames(media: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode the frame index
    space from metadata, keep every nth — the row-multiplying step a real
    decoder plugs into (payload slicing happens in the decode UDF)."""
    return (
        media.select(
            "doc_id",
            "payload",
            F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1)).alias("frame_idx"),
        )
        .where(F.col("frame_idx") % every_nth == 0)
    )


ARROW_BYTE_STATS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def arrow_byte_stats(media: DataFrame) -> DataFrame:
    """Payload byte statistics via mapInArrow — the ZERO-COPY tier of the
    Python boundary (mapInPandas still materializes a pandas object per
    column; here the computation runs directly on the Arrow RecordBatch's
    offsets/values buffers). One np.add.reduceat/minimum.reduceat over the
    batch's contiguous values buffer computes every row's sum/min/max AT
    ONCE — vectorization across rows, not per-row numpy calls; per-batch
    Python cost is O(1) interpreter work + O(bytes) SIMD.

    The pattern to copy for real 100 TB media scans: payload bytes never
    leave the Arrow buffer they arrived in from the JVM.
    """
    return media.select("doc_id", "payload").mapInArrow(
        _arrow_byte_stats_batches, schema=ARROW_BYTE_STATS
    )


def _arrow_byte_stats_batches(batches):
    """Batch-level worker for arrow_byte_stats — module-level so slice
    handling (offset AND logical end bound) is unit-testable off-cluster."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column("doc_id")
        pay = batch.column("payload")
        if pay.null_count:
            raise ValueError("arrow_byte_stats expects non-null payloads")
        off_dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
        offsets = np.frombuffer(pay.buffers()[1], dtype=off_dtype)[
            pay.offset : pay.offset + len(pay) + 1
        ].astype(np.int64)
        # Truncate to the logical end: for a sliced array reduceat's last
        # segment would otherwise run past offsets[-1] into bytes that
        # belong to rows beyond the slice.
        values = np.frombuffer(pay.buffers()[2], dtype=np.uint8)[: offsets[-1]]
        lens = np.diff(offsets)
        starts = offsets[:-1]
        nonempty = lens > 0
        sums = np.zeros(len(pay), dtype=np.int64)
        mins = np.zeros(len(pay), dtype=np.int32)
        maxs = np.zeros(len(pay), dtype=np.int32)
        if nonempty.any():
            # reduceat yields values[start] for empty segments — mask after.
            s = np.add.reduceat(values.astype(np.int64), starts.clip(max=len(values) - 1))
            mn = np.minimum.reduceat(values, starts.clip(max=len(values) - 1))
            mx = np.maximum.reduceat(values, starts.clip(max=len(values) - 1))
            sums[nonempty] = s[nonempty]
            mins[nonempty] = mn[nonempty]
            maxs[nonempty] = mx[nonempty]
        yield pa.RecordBatch.from_arrays(
            [
                ids.cast(pa.int64()),
                pa.array(lens, type=pa.int64()),
                pa.array(sums, type=pa.int64()),
                pa.array(mins, type=pa.int32()),
                pa.array(maxs, type=pa.int32()),
            ],
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("byte_len", pa.int64()),
                    ("byte_sum", pa.int64()),
                    ("min_byte", pa.int32()),
                    ("max_byte", pa.int32()),
                ]
            ),
        )



# ---------------------------------------------------------------------------
# Real audio container: RIFF/WAVE (stdlib wave module — no codec deps)
# ---------------------------------------------------------------------------
# The audio twin of the PNG path above: a genuine container format encoded
# and decoded in-container, so "real audio decode" evidence does not depend
# on librosa/ffmpeg being installed. 8-bit unsigned mono PCM is a valid WAV
# configuration, and the frame-energy math downstream of the parse is the
# same integer arithmetic audio_frame_energy uses — which is what lets a
# DuckDB oracle re-derive every energy from the source bytes.

WAV_FRAMES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def wav_encode_u8(samples, sample_rate: int = 8000) -> bytes:
    """Genuine RIFF/WAVE bytes: mono, 1 byte/sample (8-bit unsigned PCM)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype=np.uint8).tobytes())
    return buf.getvalue()


def encode_wav_media(
    df: DataFrame, id_col: str, text_col: str, sample_rate: int = 8000
) -> DataFrame:
    """Pack each row's utf-8 text bytes as 8-bit PCM into a real WAV file
    (Arrow-batched). Deterministic: payload depends only on the row."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                samples = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                ids.append(doc_id)
                payloads.append(wav_encode_u8(samples, sample_rate))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return df.select(id_col, text_col).mapInPandas(enc, schema=schema)


def wav_frame_energy(media: DataFrame, frame_samples: int = 256) -> DataFrame:
    """REAL container parse + framed energies: stdlib wave reads the RIFF
    header (channels/width/rate validated), PCM bytes come out of
    readframes, and each frame_samples window emits sum((s-128)^2) — the
    same integer energy audio_frame_energy computes on raw bytes, so the
    whole parse round-trip is oracle-checkable. Per-batch Python cost is
    one wave.open per payload (header walk) + vectorized numpy energy."""
    import io
    import wave

    import numpy as np

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, totals, idxs, energies = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getnchannels() != 1 or w.getsampwidth() != 1:
                        raise ValueError("expected 8-bit mono PCM WAV")
                    rate = w.getframerate()
                    n = w.getnframes()
                    pcm = np.frombuffer(w.readframes(n), dtype=np.uint8)
                n_frames = len(pcm) // frame_samples
                if n_frames == 0:
                    continue
                centered = pcm[: n_frames * frame_samples].astype("int64") - 128
                e = (centered * centered).reshape(n_frames, frame_samples).sum(axis=1)
                ids.extend([doc_id] * n_frames)
                rates.extend([rate] * n_frames)
                totals.extend([n] * n_frames)
                idxs.extend(range(n_frames))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(totals, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return media.mapInPandas(frames, schema=WAV_FRAMES)


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over REAL decoded images: decode each
    PNG payload (png_decode_gray — stdlib codec), split the pixel grid into
    8x8 blocks (block of pixel (y, x) = (y*8//h, x*8//w)), set bit j=br*8+bc
    iff the block mean exceeds the image mean — compared by integer
    cross-multiplication (block_sum * total_cnt > total_sum * block_cnt) so
    no division/float ever enters and the hash is bit-exact on any engine.
    Returns doc_id plus the 64-bit hash split into two BIGINT halves
    (ahash_hi = bits 32..63, ahash_lo = bits 0..31) to stay in signed-64
    range. Images shorter than 8 scanlines are skipped (no full block
    grid). Arrow-batched mapInPandas; per-image work is one decode + two
    bincounts — embarrassingly parallel, no shuffle."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ahash_hi", T.LongType()),
            T.StructField("ahash_lo", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, his, los = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = png_decode_gray(bytes(payload))
                h, w = arr.shape
                if h < 8 or w < 8:
                    continue
                ys = (np.arange(h) * 8) // h
                xs = (np.arange(w) * 8) // w
                idx = (ys[:, None] * 8 + xs[None, :]).ravel()
                flat = arr.astype(np.int64).ravel()
                sums = np.bincount(idx, weights=flat, minlength=64).astype(np.int64)
                cnts = np.bincount(idx, minlength=64).astype(np.int64)
                tsum, tcnt = int(flat.sum()), int(flat.size)
                bits = (sums * tcnt) > (tsum * cnts)
                pw = np.int64(1) << np.arange(32, dtype=np.int64)
                hi = int(bits[32:64].astype(np.int64) @ pw)
                lo = int(bits[:32].astype(np.int64) @ pw)
                ids.append(doc_id)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash_hi": pd.Series(his, dtype="int64"),
                    "ahash_lo": pd.Series(los, dtype="int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, schema=out_schema)
