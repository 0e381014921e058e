"""Multimodal plumbing: binary column synthesis, mapInPandas metadata
decode, Arrow-batched feature extraction, and the real BMP codec."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_migrator_spark.operators.multimodal import (
    attach_fake_image,
    decode_image_metadata,
    decode_image_pixels,
    extract_image_features,
)
from database_migrator_spark.sources import table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF_SMOKE, "documents").limit(50).cache()


def test_attach_and_decode_metadata(spark, docs):
    images = attach_fake_image(docs)
    assert dict(images.dtypes)["image"] == "binary"
    meta = decode_image_metadata(images)
    rows = meta.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 1 <= r.width <= 1920 and 1 <= r.height <= 1080
        assert r.fmt == "RGB8"
        assert r.payload_bytes > 0
    # payload length must equal the source text's UTF-8 byte length
    joined = meta.join(docs, "doc_id").where(
        F.col("payload_bytes") != F.octet_length(F.encode("text", "UTF-8"))
    )
    assert joined.count() == 0


def test_feature_extraction_batch_shape(spark, docs):
    feats = extract_image_features(attach_fake_image(docs))
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r.mean_byte <= 255.0 for r in rows)


def test_frame_sampling_fanout(spark, docs):
    from database_migrator_spark.operators.multimodal import sample_frames

    frames = sample_frames(attach_fake_image(docs), every_n=2)
    rows = frames.collect()
    assert len(rows) > docs.count()  # 1→N fan-out
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, fs in by_doc.items():
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(0, 2 * len(idxs), 2))  # every 2nd frame
        assert all(len(bytes(f.frame_bytes)) <= 64 for f in fs)


def test_bmp_roundtrip_pure_python():
    from database_migrator_spark.operators.multimodal import decode_bmp, encode_bmp

    # width 5 → row bytes 15 → stride pads to 16: exercises padding
    rows = [bytes(range(y, y + 15)) for y in range(4)]
    blob = encode_bmp(5, 4, rows)
    assert blob[:2] == b"BM"
    w, h, out = decode_bmp(blob)
    assert (w, h) == (5, 4)
    assert out == rows  # top-first order restored from bottom-up storage


def test_bmp_decoder_handles_top_down():
    import struct

    from database_migrator_spark.operators.multimodal import decode_bmp, encode_bmp

    rows = [bytes([y] * 9) for y in range(3)]
    blob = bytearray(encode_bmp(3, 3, rows))
    # rewrite as top-down: negate height, reorder rows accordingly
    blob[22:26] = struct.pack("<i", -3)
    stride = 12
    pix = bytearray()
    for y in range(3):
        pix += rows[y] + b"\x00" * (stride - 9)
    blob[54:] = pix
    w, h, out = decode_bmp(bytes(blob))
    assert (w, h) == (3, 3) and out == rows


def test_bmp_decoder_rejects_non_bmp():
    from database_migrator_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError, match="BM magic"):
        decode_bmp(b"IMG|1|1|RGB8|xx")


def test_wav_roundtrip_pure_python():
    from database_migrator_spark.operators.multimodal import decode_wav, encode_wav

    samples = [0, 100, -100, 2047, -2048, 7]
    blob = encode_wav(16000, samples)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    rate, out = decode_wav(blob)
    assert rate == 16000 and out == samples


def test_wav_decoder_skips_unknown_chunks():
    import struct

    from database_migrator_spark.operators.multimodal import decode_wav, encode_wav

    blob = bytearray(encode_wav(8000, [1, -2, 3]))
    # splice a LIST metadata chunk (odd size → word-aligned padding) in
    # front of the fmt chunk; a spec-correct decoder walks past it
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytes(blob[:12]) + extra + bytes(blob[12:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, out = decode_wav(spliced)
    assert rate == 8000 and out == [1, -2, 3]


def test_wav_decoder_rejects_non_wav():
    from database_migrator_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"BM" + b"\x00" * 60)


def test_decode_audio_features_real_wav_path(spark, docs):
    from database_migrator_spark.operators.multimodal import (
        attach_wav_audio,
        decode_audio_features,
    )

    out = decode_audio_features(attach_wav_audio(docs)).collect()
    assert len(out) == docs.count()
    for r in out:
        d = r.doc_id
        assert r.sample_rate == 8000 + (d % 8) * 1000
        assert r.n_samples == d % 256 + 16
        assert r.first_sample == (d * 31) % 4096 - 2048
        expected = sum(abs((d * 31 + i * 7) % 4096 - 2048) for i in range(r.n_samples)) / r.n_samples
        assert abs(r.mean_abs - expected) < 1e-12


def test_decode_pixels_real_bmp_path(spark, docs):
    from database_migrator_spark.operators.multimodal import attach_bmp_image

    out = decode_image_pixels(attach_bmp_image(docs)).collect()
    assert len(out) == docs.count()
    for r in out:
        d = r.doc_id
        assert r.width == d % 48 + 4
        assert r.height == (d * 7) % 32 + 4
        assert r.topleft_byte == d % 256  # row flip verified
        expected_mean = sum((d + y) % 256 for y in range(r.height)) / r.height
        assert abs(r.mean_pixel - expected_mean) < 1e-12


def test_png_roundtrip_all_filter_types():
    """Every scanline filter (none/sub/up/average/paeth) must round-trip
    pixel-exactly through the pure-Python DEFLATE+defilter codec."""
    import random

    from database_migrator_spark.operators.multimodal import decode_png, encode_png

    rng = random.Random(7)
    for ft in range(5):
        w, h = 13, 9
        rows = [bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)]
        blob = encode_png(w, h, rows, filter_type=ft)
        assert decode_png(blob) == (w, h, rows), f"filter {ft}"


def test_png_decoder_rejects_bad_inputs():
    import struct
    import zlib

    import pytest

    from database_migrator_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"BM not a png")
    # grayscale (color type 0) must be rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    gray = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(5 * 4)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truecolor"):
        decode_png(gray)
    with pytest.raises(ValueError, match="invalid PNG filter"):
        encode_png(1, 1, [b"\x00\x00\x00"], filter_type=9)


def test_decode_pixels_magic_dispatch():
    """decode_pixels routes BMP and PNG by magic bytes to the pure-Python
    codecs and raises clearly for unknown formats without Pillow."""
    import pytest

    from database_migrator_spark.operators import multimodal as M

    rows = [bytes([10, 20, 30] * 4) for _ in range(3)]
    assert M.decode_pixels(M.encode_bmp(4, 3, rows)) == (4, 3, rows)
    assert M.decode_pixels(M.encode_png(4, 3, rows)) == (4, 3, rows)
    # JPEG magic now routes to the pure codec: corrupt data fails clean
    with pytest.raises(ValueError, match="corrupt JPEG"):
        M.decode_pixels(b"\xff\xd8\xff\xe0 fake jpeg")
    if not M._HAS_PIL:
        with pytest.raises(ValueError, match="Pillow"):
            M.decode_pixels(b"RIFF not an image format we know")


def test_decode_pixels_nonbaseline_jpeg_reraises_without_pillow(monkeypatch):
    """The JpegUnsupported re-raise arm: a progressive (SOF2) JPEG that the
    pure codec declines must surface JpegUnsupported when Pillow is absent
    — not a generic error, so callers can tell 'install Pillow' apart from
    'corrupt data'."""
    import pytest

    from database_migrator_spark.operators import multimodal as M
    from database_migrator_spark.operators.jpeg import JpegUnsupported

    sof2 = b"\xff\xd8\xff\xc2\x00\x02"  # SOI + empty SOF2 segment
    monkeypatch.setattr(M, "_HAS_PIL", False)
    with pytest.raises(JpegUnsupported, match="non-baseline"):
        M.decode_pixels(sof2)


def test_decode_pixels_pillow_arm_plumbing(monkeypatch):
    """Execute the Pillow fallback ARM itself (this container has no
    Pillow, so the branch would otherwise only ever run in dev envs): a
    stub Image module proves decode_pixels feeds the blob to
    Image.open().convert('RGB') and re-rows tobytes() output top-first
    with width*3 stride."""
    from database_migrator_spark.operators import multimodal as M

    class _FakeImg:
        width, height = 4, 2

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def tobytes(self):
            return bytes(range(4 * 2 * 3))

    class _FakeImageModule:
        @staticmethod
        def open(buf):
            assert buf.read(4) == b"RIFF"
            return _FakeImg()

    monkeypatch.setattr(M, "_HAS_PIL", True)
    monkeypatch.setattr(M, "Image", _FakeImageModule, raising=False)
    w, h, rows = M.decode_pixels(b"RIFF....WEBP")
    assert (w, h) == (4, 2)
    assert rows == [bytes(range(0, 12)), bytes(range(12, 24))]


def test_decode_pixels_pillow_fallback_path():
    """The Pillow fallback branch, exercised wherever Pillow exists (this
    container ships without it — the test self-skips here but runs in any
    dev env that has Pillow, so the branch is not permanently untested):
    a JPEG produced by Pillow must round-trip through decode_pixels with
    the right dimensions and near-exact flat color (a solid block is
    DC-only, so baseline JPEG reproduces it almost exactly)."""
    import pytest

    from database_migrator_spark.operators import multimodal as M

    if not M._HAS_PIL:
        pytest.skip("Pillow not installed in this container")
    import io

    from PIL import Image

    img = Image.new("RGB", (16, 8), (200, 100, 50))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    w, h, rows = M.decode_pixels(buf.getvalue())
    assert (w, h) == (16, 8)
    assert len(rows) == 8 and all(len(r) == 16 * 3 for r in rows)
    px = rows[0]
    assert abs(px[0] - 200) <= 8 and abs(px[1] - 100) <= 8 and abs(px[2] - 50) <= 8


def test_jpeg_flat_gray_roundtrip_exact():
    """Flat gray blocks are the codec's exact subset: DC-only DCT under
    identity quantization + gray as a YCbCr fixed point. Every sampling
    mode and ragged dimension must round-trip bit-for-bit."""
    from database_migrator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    def make(w, h, g):
        return [
            bytes(b for x in range(w) for b in 3 * (g(x // 8, y // 8),))
            for y in range(h)
        ]

    for subsample in (False, True):
        for (w, h) in ((16, 8), (19, 13), (40, 28)):
            rows = make(w, h, lambda bx, by: (49 + bx * 13 + by * 29) % 256)
            ww, hh, out = decode_jpeg(encode_jpeg(w, h, rows, subsample=subsample))
            assert (ww, hh) == (w, h)
            assert out == rows, f"mismatch sub={subsample} {w}x{h}"


def test_jpeg_gradient_roundtrip_close():
    """General content through identity quantization: lossy only through
    coefficient rounding and chroma subsampling — max per-byte error
    stays tiny (bounds the IDCT/huffman/color chain end to end)."""
    import numpy as np

    from database_migrator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    w, h = 32, 24
    rows = [
        bytes(((x * 3 + y * 5 + c) % 256) for x in range(w) for c in range(3))
        for y in range(h)
    ]
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, rows))
    a = np.frombuffer(b"".join(rows), dtype=np.uint8).astype(int)
    b = np.frombuffer(b"".join(out), dtype=np.uint8).astype(int)
    assert (ww, hh) == (w, h)
    assert np.abs(a - b).max() <= 2  # 4:4:4: rounding only


def test_jpeg_byte_stuffing_and_magic_dispatch():
    """0xFF entropy bytes must be stuffed by the writer and unstuffed by
    the reader; decode_pixels must route JPEG magic to the pure codec
    (no Pillow needed)."""
    from database_migrator_spark.operators import multimodal as M
    from database_migrator_spark.operators.jpeg import (
        _BitReader,
        _BitWriter,
        encode_jpeg,
    )

    wr = _BitWriter()
    for v in (0xFF, 0xFF, 0x12, 0xFF):
        wr.write(v, 8)
    data = wr.flush()
    assert data == b"\xff\x00\xff\x00\x12\xff\x00"  # every FF stuffed
    rd = _BitReader(data, 0)
    assert [rd.bits(8) for _ in range(4)] == [0xFF, 0xFF, 0x12, 0xFF]

    w, h = 64, 64
    rows = [
        bytes(b for x in range(w) for b in 3 * ((x // 8 * 37 + y // 8 * 101) % 256,))
        for y in range(h)
    ]
    assert M.decode_pixels(encode_jpeg(w, h, rows)) == (w, h, rows)


def test_jpeg_rejects_non_baseline():
    """Progressive frames and restart intervals must raise the typed
    JpegUnsupported (the dispatch's Pillow-fallback trigger), never
    return wrong pixels."""
    import struct

    import pytest

    from database_migrator_spark.operators.jpeg import (
        JpegUnsupported,
        decode_jpeg,
        encode_jpeg,
    )

    blob = bytearray(encode_jpeg(8, 8, [bytes([5, 5, 5] * 8)] * 8))
    i = blob.find(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2 :]
    with pytest.raises(JpegUnsupported, match="SOF2"):
        decode_jpeg(bytes(prog))
    dri = blob[:i] + b"\xff\xdd" + struct.pack(">HH", 4, 1) + blob[i:]
    with pytest.raises(JpegUnsupported, match="restart"):
        decode_jpeg(bytes(dri))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_audio_frame_features_windowing_edges(spark):
    """q133's windowing contract on a hand-built WAV: 35 samples at
    frame_len=16 yield exactly 2 frames (3-sample tail DROPPED — its
    samples must not leak into total_energy), and an energy tie between
    frames 0 and 1 resolves to the FIRST frame."""
    from database_migrator_spark.operators.multimodal import (
        audio_frame_features,
        encode_wav,
    )

    # frames 0 and 1 identical (energy tie); loud 3-sample tail would
    # dominate total_energy if leaked
    samples = [3, -4] * 8 + [3, -4] * 8 + [2000, 2000, 2000]
    blob = encode_wav(8000, samples)
    df = spark.createDataFrame([(7, bytearray(blob))], "doc_id long, audio binary")
    row = audio_frame_features(df).collect()[0]
    frame_e = sum(s * s for s in [3, -4] * 8)  # 200
    assert row.n_frames == 2
    assert row.total_energy == 2 * frame_e
    assert row.peak_frame == 0  # tie -> first
    assert row.peak_energy == frame_e
    assert row.active_frames == 0


def test_silence_run_stats_boundaries():
    """q217's run-length contract on hand-built PCM: a run of exactly
    min_run samples IS a segment (boundary inclusive), min_run-1 is not,
    and a silent run still open at stream end counts — the two branches
    a naive loop drops."""
    from database_migrator_spark.operators.multimodal import silence_run_stats

    loud, quiet = 2000, 0
    # exactly 8 silent then loud: one segment
    assert silence_run_stats([quiet] * 8 + [loud]) == (8, 1, 8)
    # 7 silent then loud: silent samples counted but NO segment
    assert silence_run_stats([quiet] * 7 + [loud]) == (7, 0, 7)
    # trailing run open at stream end: still a segment
    assert silence_run_stats([loud] + [quiet] * 9) == (9, 1, 9)
    # trailing run below min_run: no segment
    assert silence_run_stats([loud] + [quiet] * 3) == (3, 0, 3)
    # threshold is STRICT |s| < 512: +/-511 silent, +/-512 loud
    assert silence_run_stats([511, -511, 512, -512]) == (2, 0, 2)
    # two separated segments; longest tracks the larger
    assert silence_run_stats([quiet] * 8 + [loud] + [quiet] * 10) == (18, 2, 10)
    # empty stream
    assert silence_run_stats([]) == (0, 0, 0)


def test_q217_matches_direct_decode(spark):
    """End-to-end q217 on the smoke corpus agrees with decoding each WAV
    in-process and walking it with silence_run_stats — pins the Arrow
    seam (mapInPandas batch shape) against the pure-Python reference."""
    from database_migrator_spark.operators.multimodal import (
        attach_wav_audio,
        decode_wav,
        silence_run_stats,
    )
    from database_migrator_spark.plans.registry import all_queries
    from database_migrator_spark.sources import table

    from .conftest import SF_SMOKE

    got = {
        r.doc_id: (r.n_samples, r.n_silent, r.n_silence_segments, r.longest_silence_run)
        for r in all_queries()["q217_audio_silence_segments"].build(spark, SF_SMOKE).collect()
    }
    d = table(spark, SF_SMOKE, "documents").select("doc_id").limit(20)
    for r in attach_wav_audio(d).collect():
        _rate, samples = decode_wav(bytes(r.audio))
        n_silent, n_segs, longest = silence_run_stats(samples)
        assert got[r.doc_id] == (len(samples), n_silent, n_segs, longest)


def test_shot_boundaries_recover_true_shot_structure(spark):
    """q244: the byte-level detector must recover the PLANTED shot
    structure exactly on the smoke corpus — n_shots =
    ceil(n_frames/shot_len) and the first boundary at frame shot_len —
    and the L1 margin that makes detection exact must hold (max
    within-shot distance < threshold < min boundary distance)."""
    import math

    from database_migrator_spark.operators.multimodal import (
        attach_shot_video,
        detect_shot_boundaries,
    )
    from database_migrator_spark.sources import table as _table

    from .conftest import SF_SMOKE

    d = _table(spark, SF_SMOKE, "documents")
    rows = detect_shot_boundaries(attach_shot_video(d)).collect()
    assert rows
    for r in rows:
        shot_len = r.doc_id % 7 + 3
        assert r.n_frames == r.doc_id % 40 + 5
        assert r.n_shots == math.ceil(r.n_frames / shot_len)
        expect_first = shot_len if r.n_frames > shot_len else -1
        assert r.first_boundary == expect_first
    # margin check on one blob: within-shot L1 < 1500 < boundary L1
    blob = bytes(
        attach_shot_video(d.where(F.col("doc_id") == 11)).collect()[0].video
    )
    shot_len = 11 % 7 + 3
    l1s = []
    for i in range(1, len(blob) // 64):
        prev, cur = blob[(i - 1) * 64 : i * 64], blob[i * 64 : (i + 1) * 64]
        l1s.append((i, sum(abs(x - y) for x, y in zip(cur, prev))))
    for i, l1 in l1s:
        if i % shot_len == 0:
            assert l1 > 1500
        else:
            assert l1 < 1500
