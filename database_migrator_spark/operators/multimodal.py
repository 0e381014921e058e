"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

Two image paths:
- REAL decode: 24-bit uncompressed BMP, 8-bit truecolor PNG, and
  baseline JPEG, each parsed by a pure-Python codec (no codec library
  needed; see operators/jpeg.py for the JFIF one). Non-baseline JPEG
  features and other compressed formats route through Pillow when
  present, with a clear error when not.
- Fake self-describing blobs (``b"IMG|<w>|<h>|<fmt>|" + payload``) for
  the metadata/feature plumbing demos.

At 100 TB the blobs live in parquet binary columns (or object-store
pointers) and the decode UDF is the only part that changes; everything
here is partition-preserving mapInPandas over Arrow batches.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import spread_for_cpu, table

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

IMAGE_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, fmt string, payload_bytes bigint"
)
IMAGE_FEATURE_SCHEMA = "doc_id bigint, mean_byte double, n_bytes bigint"


def attach_fake_image(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary 'image' column from the text (the
    real pipeline would read parquet binary directly). Pure JVM expressions.
    Repartitions first: blob processing is CPU-bound per row and the
    single-file test table would otherwise run on one core.

    Dimensions derive from md5 slices of the id (not xxhash) so ANY engine
    can recompute them — that's what upgrades q37 from rows-only to a
    hash-matched oracle (q121's trick)."""
    docs = spread_for_cpu(docs)
    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    width = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 1920 + 1).cast("long")
    height = (F.conv(F.substring(h, 5, 4), 16, 10).cast("long") % 1080 + 1).cast("long")
    header = F.concat_ws(
        "|", F.lit("IMG"), width.cast("string"), height.cast("string"), F.lit("RGB8"), F.lit("")
    )
    blob = F.concat(F.encode(header, "UTF-8"), F.encode(F.col(text_col), "UTF-8"))
    return docs.select(F.col(id_col), blob.alias("image"))


def decode_image_metadata(images: DataFrame) -> DataFrame:
    """Parse blob headers into typed metadata via mapInPandas (Arrow batch
    in / Arrow batch out, partition-preserving — no shuffle)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                b = bytes(blob)
                magic, w, h, fmt, payload = b.split(b"|", 4)
                assert magic == b"IMG"
                out.append((doc_id, int(w), int(h), fmt.decode(), len(payload)))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "fmt", "payload_bytes"]
            )

    return images.mapInPandas(parse, schema=IMAGE_META_SCHEMA)


# --- real BMP encode/decode (pure Python — BMP is uncompressed, so no
# codec library is required; this is the REAL pixel path) -----------------

_BMP_HEADER_BYTES = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp(width: int, height: int, row_bytes: list[bytes]) -> bytes:
    """Serialize top-first BGR rows (``len == width*3`` each) into a valid
    bottom-up 24-bit uncompressed BMP with 4-byte row stride padding."""
    stride = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - width * 3)
    pixels = b"".join(row_bytes[y] + pad for y in reversed(range(height)))
    file_size = _BMP_HEADER_BYTES + len(pixels)
    file_header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, _BMP_HEADER_BYTES)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def decode_bmp(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a 24-bit uncompressed BMP; returns (width, height, rows) with
    rows top-first and stride padding removed. Handles both bottom-up
    (positive height — the common case) and top-down (negative) storage."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    (pix_off,) = struct.unpack_from("<I", blob, 10)
    width, raw_height = struct.unpack_from("<ii", blob, 18)
    _planes, bpp = struct.unpack_from("<HH", blob, 26)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported, got bpp={bpp} comp={compression}")
    top_down = raw_height < 0
    height = abs(raw_height)
    stride = (width * 3 + 3) // 4 * 4
    rows = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        off = pix_off + src * stride
        rows.append(blob[off : off + width * 3])
    return width, height, rows


BMP_DECODE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, mean_pixel double, topleft_byte bigint"
)


# --- real PNG encode/decode (pure Python + stdlib zlib — PNG's DEFLATE
# stream and the five scanline filters, so the COMPRESSED image path is
# exercised with no codec library in the container; JPEG still routes
# through Pillow when present) --------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, row_bytes: list[bytes], filter_type: int = 0) -> bytes:
    """Serialize top-first RGB rows (``len == width*3`` each) into a valid
    8-bit truecolor PNG. ``filter_type`` selects the per-scanline filter
    (0 none, 1 sub, 2 up, 3 average, 4 paeth) so tests can exercise every
    decoder defilter path with real spec-conformant files."""
    import zlib

    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"invalid PNG filter type {filter_type}")
    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for row in row_bytes:
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        else:
            for i, x in enumerate(row):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if filter_type == 1:
                    raw.append((x - a) & 0xFF)
                elif filter_type == 2:
                    raw.append((x - b) & 0xFF)
                elif filter_type == 3:
                    raw.append((x - (a + b) // 2) & 0xFF)
                else:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    raw.append((x - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an 8-bit truecolor (RGB, color type 2) non-interlaced PNG;
    returns (width, height, rows) top-first. Walks chunks, inflates the
    concatenated IDAT DEFLATE stream, and reverses all five scanline
    filters (none/sub/up/average/paeth)."""
    import zlib

    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    "only 8-bit truecolor non-interlaced PNG supported, got "
                    f"depth={depth} color={color} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT payload does not match dimensions")
    rows: list[bytes] = []
    prev = bytearray(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"invalid PNG filter type {ft}")
        rows.append(bytes(line))
        prev = line
    return width, height, rows


# --- real WAV/PCM encode/decode (pure Python — PCM is uncompressed; the
# audio analogue of the BMP path) -----------------------------------------


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Serialize mono 16-bit PCM samples into a valid RIFF/WAVE file."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> tuple[int, list[int]]:
    """Parse a mono 16-bit PCM RIFF/WAVE file by walking its chunks;
    returns (sample_rate, samples). Chunks other than fmt/data (e.g. LIST
    metadata) are skipped, as the spec requires."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    samples: list[int] | None = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only mono 16-bit PCM supported, got fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            samples = [s[0] for s in struct.iter_unpack("<h", body)]
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, samples


WAV_DECODE_SCHEMA = (
    "doc_id bigint, sample_rate bigint, n_samples bigint, "
    "mean_abs double, first_sample bigint"
)


def attach_wav_audio(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL (valid, decodable) mono 16-bit PCM WAV per doc:
    rate = 8000 + (doc_id%8)*1000, n = doc_id%256+16 samples, sample i =
    ((doc_id*31 + i*7) % 4096) - 2048 — closed forms an oracle recomputes."""
    docs = spread_for_cpu(docs, cap=16)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = d % 256 + 16
                samples = [((d * 31 + i * 7) % 4096) - 2048 for i in range(n)]
                out.append((d, encode_wav(8000 + (d % 8) * 1000, samples)))
            yield pd.DataFrame(out, columns=["doc_id", "audio"])

    return docs.select(id_col).mapInPandas(gen, schema="doc_id bigint, audio binary")


def decode_audio_features(audios: DataFrame, id_col: str = "doc_id",
                          blob_col: str = "audio") -> DataFrame:
    """REAL audio decode over mapInPandas: walk the RIFF chunks, parse the
    fmt header and PCM samples, reduce to (rate, count, mean |amplitude|,
    first sample) — the feature-extraction shape a real audio encoder UDF
    uses, minus the model."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                rate, samples = decode_wav(bytes(blob))
                mean_abs = sum(abs(s) for s in samples) / len(samples)
                out.append((int(doc_id), rate, len(samples), mean_abs, samples[0]))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "sample_rate", "n_samples", "mean_abs", "first_sample"],
            )

    return audios.mapInPandas(decode, schema=WAV_DECODE_SCHEMA)


def attach_bmp_image(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL (valid, decodable) 24-bit BMP per document:
    width = doc_id%48+4, height = (doc_id*7)%32+4, every channel byte in
    row y is (doc_id+y)%256 — closed forms an SQL oracle can recompute.

    Partitioning: capped at 16 — the chained generate→decode pipeline runs
    TWO Python workers per partition, and at test scale worker spin-up
    dominates the (tiny) per-row work. At 100 TB the table arrives in many
    partitions already and the repartition is a no-op passthrough."""
    docs = spread_for_cpu(docs, cap=16)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = d % 48 + 4, (d * 7) % 32 + 4
                rows = [bytes([(d + y) % 256] * (w * 3)) for y in range(h)]
                out.append((d, encode_bmp(w, h, rows)))
            yield pd.DataFrame(out, columns=["doc_id", "image"])

    return docs.select(id_col).mapInPandas(gen, schema="doc_id bigint, image binary")


def decode_pixels(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Magic-dispatched pixel decode: BMP, PNG, and baseline JPEG decode
    with the pure-Python codecs; non-baseline JPEG features and other
    formats (WebP, ...) route through Pillow when present, with a clear
    error when it is not."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        from database_migrator_spark.operators.jpeg import JpegUnsupported, decode_jpeg

        try:
            return decode_jpeg(blob)
        except JpegUnsupported:
            if not _HAS_PIL:
                raise
    if not _HAS_PIL:
        raise ValueError(
            "unsupported image format (not BMP/PNG/baseline-JPEG) and Pillow "
            "is not installed for compressed-codec fallback"
        )
    import io

    img = Image.open(io.BytesIO(blob)).convert("RGB")
    px = img.tobytes()
    stride = img.width * 3
    rows = [px[y * stride : (y + 1) * stride] for y in range(img.height)]
    return img.width, img.height, rows


def decode_image_pixels(images: DataFrame, id_col: str = "doc_id",
                        blob_col: str = "image") -> DataFrame:
    """REAL pixel decode over mapInPandas: parse each blob (BMP or PNG via
    the pure-Python codecs, other formats via Pillow) and reduce the
    de-padded pixel array to (width, height, mean channel byte, top-left
    byte — which lives at the END of a bottom-up BMP pixel array, so a
    decoder that forgets to flip rows fails the hash)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                w, h, rows = decode_pixels(bytes(blob))
                total = sum(sum(r) for r in rows)
                mean = total / (w * h * 3)
                out.append((int(doc_id), w, h, mean, rows[0][0]))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "mean_pixel", "topleft_byte"]
            )

    return images.mapInPandas(decode, schema=BMP_DECODE_SCHEMA)


def extract_image_features(images: DataFrame) -> DataFrame:
    """Deterministic fake feature extraction (mean payload byte) standing in
    for an embedding model — demonstrates the Arrow batch shape a real
    encoder UDF would use (one vector per row, vectorized over the batch)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                payload = bytes(blob).split(b"|", 4)[4]
                mean = float(sum(payload)) / len(payload) if payload else 0.0
                rows.append((doc_id, mean, len(payload)))
            yield pd.DataFrame(rows, columns=["doc_id", "mean_byte", "n_bytes"])

    return images.mapInPandas(feats, schema=IMAGE_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes binary"


def sample_frames(videos: DataFrame, every_n: int = 10, id_col: str = "doc_id",
                  blob_col: str = "image") -> DataFrame:
    """Frame sampling over opaque 'video' blobs via mapInPandas: emit every
    ``every_n``-th fixed-size chunk as a 'frame'. A real decoder (ffmpeg /
    pyav) is absent in this container, so frames are deterministic byte
    slices — the Spark plumbing (1→N row fan-out inside an Arrow batch,
    binary columns both directions, partition-preserving) is exactly what
    a real sampler uses."""
    frame_size = 64

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                n_frames = max(1, len(b) // frame_size)
                for i in range(0, n_frames, every_n):
                    out.append((doc_id, i, b[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_bytes"])

    return videos.mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)


@query(
    "q36_binary_columns",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text)                                        AS digest
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "binary"),
)
def q36_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary handling hash-matched across engines: byte length and
    md5 digest of the UTF-8 blob."""
    d = table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("digest"),
    ).orderBy("doc_id")


@query(
    "q37_image_metadata",
    oracle="""
    WITH d AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h, text FROM documents
    )
    SELECT doc_id,
           CAST(( (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) ) % 1920 + 1
                                                             AS BIGINT) AS width,
           CAST(( (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) ) % 1080 + 1
                                                             AS BIGINT) AS height,
           'RGB8'                                            AS fmt,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)  AS payload_bytes
    FROM d
    ORDER BY doc_id
    """,
    tags=("multimodal", "mapInPandas"),
)
def q37_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata decode of opaque blobs over mapInPandas, now
    hash-matched: the fake image's header dimensions are md5-slice
    functions of doc_id (engine-reproducible, q121's trick), so the
    oracle recomputes the parsed width/height/format/payload size
    arithmetically and the Arrow round-trip (binary in, typed batch out)
    sits fully under the driver's hash gate."""
    d = table(spark, sf_dir, "documents")
    return decode_image_metadata(attach_fake_image(d)).orderBy("doc_id")


@query(
    "q67_bmp_decode",
    oracle="""
    SELECT doc_id,
           doc_id % 48 + 4                                   AS width,
           (doc_id * 7) % 32 + 4                             AS height,
           list_avg(list_transform(range(0, (doc_id * 7) % 32 + 4),
                                   y -> CAST((doc_id + y) % 256 AS DOUBLE)))
                                                             AS mean_pixel,
           doc_id % 256                                      AS topleft_byte
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "bmp", "decode", "mapInPandas"),
)
def q67_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, hash-matched: synthesize a valid 24-bit BMP per
    document (pixel bytes follow closed forms of doc_id), decode it with
    the pure-Python parser — headers, stride padding, bottom-up row flip —
    and hash-match width/height/mean-pixel/top-left byte against the
    oracle recomputing the closed forms arithmetically. The top-left byte
    sits at the END of a bottom-up BMP pixel array, so a decoder that
    skips the row flip (or mis-strides the padding) fails the hash."""
    d = table(spark, sf_dir, "documents")
    return decode_image_pixels(attach_bmp_image(d)).orderBy("doc_id")


def attach_png_image(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL (valid, decodable) 8-bit truecolor PNG per
    document: width = doc_id%40+4, height = (doc_id*3)%24+4, channel byte
    i of row y is (doc_id + y*3 + i) % 256 — closed forms an SQL oracle
    recomputes — and scanline filter type = doc_id % 5, so the corpus
    collectively exercises every PNG defilter path (none/sub/up/average/
    paeth) under the hash gate."""
    docs = spread_for_cpu(docs, cap=16)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = d % 40 + 4, (d * 3) % 24 + 4
                rows = [
                    bytes((d + y * 3 + i) % 256 for i in range(w * 3))
                    for y in range(h)
                ]
                out.append((d, encode_png(w, h, rows, filter_type=d % 5)))
            yield pd.DataFrame(out, columns=["doc_id", "image"])

    return docs.select(id_col).mapInPandas(gen, schema="doc_id bigint, image binary")


@query(
    "q102_png_decode",
    oracle="""
    SELECT doc_id,
           doc_id % 40 + 4                                   AS width,
           (doc_id * 3) % 24 + 4                             AS height,
           list_avg(flatten(list_transform(
               range(0, (doc_id * 3) % 24 + 4),
               y -> list_transform(range(0, (doc_id % 40 + 4) * 3),
                                   i -> CAST((doc_id + y * 3 + i) % 256 AS DOUBLE)))))
                                                             AS mean_pixel,
           doc_id % 256                                      AS topleft_byte
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "png", "decode", "mapInPandas"),
)
def q102_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode, hash-matched: synthesize a valid PNG
    per document (DEFLATE-compressed IDAT, scanline filter cycling
    through all five types by doc_id%5), decode it with the pure-Python
    codec — chunk walk, zlib inflate, defilter — and hash-match
    width/height/mean-pixel/top-left byte against the oracle recomputing
    the pixel closed forms arithmetically. A decoder that mis-reverses
    any of sub/up/average/paeth shifts the mean and fails the hash."""
    d = table(spark, sf_dir, "documents")
    return decode_image_pixels(attach_png_image(d)).orderBy("doc_id")


def attach_jpeg_image(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL baseline JFIF per document: dimensions
    (doc_id%4+1)*8 + doc_id%7 × (doc_id%3+1)*8 + doc_id%5 (ragged, so
    partial MCUs are exercised), 4:2:0 for even doc_ids / 4:4:4 for odd,
    and every 8×8 block a FLAT GRAY g(bx,by) = (doc_id*7 + bx*13 +
    by*29) % 256. Flat blocks are DC-only (identity quantization keeps
    them exact through the DCT) and gray survives the YCbCr round-trip
    bit-for-bit, so the decoded pixels follow a closed form an SQL
    oracle recomputes — the same trick as the PNG corpus, but through a
    LOSSY codec's exact subset."""
    from database_migrator_spark.operators.jpeg import encode_jpeg

    docs = spread_for_cpu(docs, cap=16)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w = (d % 4 + 1) * 8 + d % 7
                h = (d % 3 + 1) * 8 + d % 5
                rows = [
                    bytes(
                        b
                        for x in range(w)
                        for b in 3 * ((d * 7 + (x // 8) * 13 + (y // 8) * 29) % 256,)
                    )
                    for y in range(h)
                ]
                out.append((d, encode_jpeg(w, h, rows, subsample=(d % 2 == 0))))
            yield pd.DataFrame(out, columns=["doc_id", "image"])

    return docs.select(id_col).mapInPandas(gen, schema="doc_id bigint, image binary")


@query(
    "q112_jpeg_decode",
    oracle="""
    SELECT doc_id,
           (doc_id % 4 + 1) * 8 + doc_id % 7 AS width,
           (doc_id % 3 + 1) * 8 + doc_id % 5 AS height,
           CAST(3 * CAST(list_sum(flatten(list_transform(
                 range(0, ((doc_id % 3 + 1) * 8 + doc_id % 5 + 7) // 8),
                 by -> list_transform(
                   range(0, ((doc_id % 4 + 1) * 8 + doc_id % 7 + 7) // 8),
                   bx -> ((doc_id * 7 + bx * 13 + by * 29) % 256)
                         * least(8, (doc_id % 4 + 1) * 8 + doc_id % 7 - bx * 8)
                         * least(8, (doc_id % 3 + 1) * 8 + doc_id % 5 - by * 8)))))
               AS BIGINT) AS DOUBLE)
             / CAST(((doc_id % 4 + 1) * 8 + doc_id % 7)
                    * ((doc_id % 3 + 1) * 8 + doc_id % 5) * 3 AS DOUBLE)
                                             AS mean_pixel,
           (doc_id * 7) % 256                AS topleft_byte
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "jpeg", "decode", "mapInPandas"),
)
def q112_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-codec decode, hash-matched: synthesize a valid baseline
    JPEG per document (huffman entropy coding, byte stuffing, 4:2:0 on
    even doc_ids, ragged dimensions with edge-padded partial MCUs),
    decode it with the pure-Python codec — marker walk, canonical
    huffman, dequant, IDCT, chroma upsample, YCbCr→RGB — and hash-match
    width/height/mean-pixel/top-left against the oracle's closed forms.
    The corpus is built from the codec's EXACT subset (flat gray 8×8
    blocks; see attach_jpeg_image), so a decoder bug anywhere in that
    chain shifts the mean and fails the hash."""
    d = table(spark, sf_dir, "documents")
    return decode_image_pixels(attach_jpeg_image(d)).orderBy("doc_id")


@query(
    "q69_wav_decode",
    oracle="""
    SELECT doc_id,
           8000 + (doc_id % 8) * 1000                        AS sample_rate,
           doc_id % 256 + 16                                 AS n_samples,
           list_avg(list_transform(range(0, doc_id % 256 + 16),
                    i -> CAST(abs((doc_id * 31 + i * 7) % 4096 - 2048) AS DOUBLE)))
                                                             AS mean_abs,
           (doc_id * 31) % 4096 - 2048                       AS first_sample
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "wav", "audio", "decode", "mapInPandas"),
)
def q69_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, hash-matched: synthesize a valid mono 16-bit PCM
    WAV per document (samples follow closed forms of doc_id), decode it by
    walking the RIFF chunks — fmt header, word-aligned chunk sizes,
    little-endian int16 data — and hash-match rate/count/mean-|amplitude|/
    first-sample against the oracle recomputing the closed forms."""
    d = table(spark, sf_dir, "documents")
    return decode_audio_features(attach_wav_audio(d)).orderBy("doc_id")


FRAME_STATS_SCHEMA = "doc_id bigint, frame_idx bigint, mean_byte double, first_byte bigint"


def attach_raw_video(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a raw-frame 'video' blob per document (the rawvideo
    layout: fixed-size frames concatenated back-to-back, no container
    header): ``doc_id % 40 + 5`` frames of 64 bytes, where byte j of frame
    i is ``(doc_id + 3*i + j) % 256`` — closed forms an SQL oracle can
    recompute. Same partition-cap rationale as attach_bmp_image."""
    docs = spread_for_cpu(docs, cap=16)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n_frames = d % 40 + 5
                blob = b"".join(
                    bytes((d + 3 * i + j) % 256 for j in range(64))
                    for i in range(n_frames)
                )
                out.append((d, blob))
            yield pd.DataFrame(out, columns=["doc_id", "video"])

    return docs.select(id_col).mapInPandas(gen, schema="doc_id bigint, video binary")


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-sampled-frame feature reduction (mean byte + first byte) —
    the stand-in for a per-frame embedding/caption model, with the real
    Arrow batch shape such a model UDF uses."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, idx, fb in zip(
                pdf["doc_id"], pdf["frame_idx"], pdf["frame_bytes"]
            ):
                b = bytes(fb)
                out.append((int(doc_id), int(idx), sum(b) / len(b), b[0]))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "mean_byte", "first_byte"]
            )

    return frames.mapInPandas(stats, schema=FRAME_STATS_SCHEMA)


@query(
    "q124_video_frame_sample",
    oracle="""
    SELECT doc_id,
           i                                                 AS frame_idx,
           list_avg(list_transform(range(0, 64),
                    j -> CAST((doc_id + 3*i + j) % 256 AS DOUBLE)))
                                                             AS mean_byte,
           (doc_id + 3*i) % 256                              AS first_byte
    FROM documents, unnest(range(0, doc_id % 40 + 5, 10)) AS u(i)
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "video", "frame-sample", "mapInPandas"),
)
def q124_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling, hash-matched end to end: synthesize a
    raw-frame video blob per document (frame bytes follow closed forms of
    doc_id), sample every 10th frame with the generic ``sample_frames``
    chunker (1→N row fan-out inside an Arrow batch), then reduce each
    sampled frame to mean/first byte — and hash-match against the oracle
    recomputing the closed forms arithmetically, so the frame-boundary
    math (offset i*frame_size, no drift across frames) is verified, not
    assumed. A real decoder (ffmpeg/pyav) is absent in this container;
    with one present only ``attach_raw_video``'s generator and
    ``frame_stats``'s reducer change — the Spark plumbing (binary columns,
    partition-preserving mapInPandas chain, fan-out batches) is identical."""
    d = table(spark, sf_dir, "documents")
    frames = sample_frames(attach_raw_video(d), every_n=10, blob_col="video")
    return frame_stats(frames).orderBy("doc_id", "frame_idx")


RESIZE_SCHEMA = (
    "doc_id bigint, out_width bigint, out_height bigint, "
    "mean_pooled double, topleft_pooled bigint"
)


def resize_images(images: DataFrame, id_col: str = "doc_id",
                  blob_col: str = "image") -> DataFrame:
    """2× average-pool downsample over decoded pixels (the resize step of
    an image-curation pipeline, e.g. normalizing crawl images to a model's
    input resolution): decode the blob with the magic-dispatched codecs,
    pool non-overlapping 2×2 blocks per channel with integer floor
    division, and reduce to (out dims, mean pooled byte, top-left pooled
    byte). Odd trailing rows/columns are cropped (the standard
    floor-division convention). A real pipeline swaps the pooling loop
    for PIL/cv2 resize — the Arrow plumbing and the decode dispatch stay
    identical."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                w, h, rows = decode_pixels(bytes(blob))
                ow, oh = w // 2, h // 2
                total = 0
                topleft = None
                for j in range(oh):
                    r0, r1 = rows[2 * j], rows[2 * j + 1]
                    for i in range(ow):
                        for c in range(3):
                            a = r0[6 * i + c] + r0[6 * i + 3 + c]
                            b = r1[6 * i + c] + r1[6 * i + 3 + c]
                            v = (a + b) // 4
                            total += v
                            if topleft is None:
                                topleft = v
                mean = total / (ow * oh * 3) if ow and oh else 0.0
                out.append((int(doc_id), ow, oh, mean, topleft if topleft is not None else 0))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "out_width", "out_height", "mean_pooled", "topleft_pooled"],
            )

    return images.mapInPandas(resize, schema=RESIZE_SCHEMA)


@query(
    "q132_image_resize",
    oracle="""
    SELECT doc_id,
           CAST((doc_id % 48 + 4) // 2 AS BIGINT)            AS out_width,
           CAST(((doc_id * 7) % 32 + 4) // 2 AS BIGINT)      AS out_height,
           list_avg(list_transform(range(0, ((doc_id * 7) % 32 + 4) // 2),
               j -> CAST((2 * ((doc_id + 2*j) % 256) + 2 * ((doc_id + 2*j + 1) % 256)) // 4
                    AS DOUBLE)))                             AS mean_pooled,
           CAST((2 * (doc_id % 256) + 2 * ((doc_id + 1) % 256)) // 4 AS BIGINT)
                                                             AS topleft_pooled
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "resize", "decode", "mapInPandas"),
)
def q132_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE hash-matched end to end (completing the multimodal
    quartet: decode / feature-extract / resize / frame-sample): the
    synthetic BMPs' closed-form pixels let the oracle recompute the 2×2
    average-pool arithmetically — within a source row all bytes equal
    (d+y)%256, so a pooled pixel is ((2·(d+2j)%256 + 2·(d+2j+1)%256)
    div 4) and the whole pooled image reduces to a per-row closed form.
    A decoder that mis-strides, forgets the bottom-up flip, or pools
    overlapping blocks fails the hash."""
    d = table(spark, sf_dir, "documents")
    return resize_images(attach_bmp_image(d)).orderBy("doc_id")


AUDIO_FRAME_SCHEMA = (
    "doc_id bigint, n_frames bigint, total_energy bigint, "
    "peak_frame bigint, peak_energy bigint, active_frames bigint"
)

#: per-frame energy threshold for q133's activity detector: a frame of 16
#: samples uniform over [-2048, 2048) has expected energy 16*4096^2/12
#: ~ 22.4M, so 20M splits the synthetic corpus's frames nontrivially.
AUDIO_ACTIVE_ENERGY = 20_000_000


def audio_frame_features(audios: DataFrame, frame_len: int = 16,
                         id_col: str = "doc_id",
                         blob_col: str = "audio") -> DataFrame:
    """Windowed audio feature extraction (the voice-activity-detection /
    silence-trimming shape of a speech curation pipeline): decode the WAV,
    split the PCM stream into fixed ``frame_len``-sample frames (partial
    tail frame dropped — the standard hop convention), and reduce each
    document to frame count, total in-frame energy, the argmax-energy
    frame (first on ties), its energy, and the count of frames above the
    activity threshold. All-integer arithmetic (samples bounded by 2^11,
    frame energy by 2^26) keeps the result exact and order-independent on
    both engines. A real pipeline swaps the energy reduction for an
    acoustic model / VAD net over the same Arrow batches."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                _rate, samples = decode_wav(bytes(blob))
                n_frames = len(samples) // frame_len
                energies = [
                    sum(s * s for s in samples[f * frame_len:(f + 1) * frame_len])
                    for f in range(n_frames)
                ]
                peak_energy = max(energies)
                peak_frame = energies.index(peak_energy)
                out.append((
                    int(doc_id), n_frames, sum(energies), peak_frame,
                    peak_energy,
                    sum(1 for e in energies if e >= AUDIO_ACTIVE_ENERGY),
                ))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_frames", "total_energy", "peak_frame",
                         "peak_energy", "active_frames"],
            )

    return audios.mapInPandas(feats, schema=AUDIO_FRAME_SCHEMA)


@query(
    "q133_audio_frame_energy",
    oracle=f"""
    WITH e AS (
      SELECT doc_id,
             (doc_id % 256 + 16) // 16 AS n_frames,
             list_transform(range(0, (doc_id % 256 + 16) // 16),
               fr -> list_sum(list_transform(range(fr * 16, fr * 16 + 16),
                     i -> CAST((doc_id * 31 + i * 7) % 4096 - 2048 AS BIGINT)
                          * CAST((doc_id * 31 + i * 7) % 4096 - 2048 AS BIGINT))))
                                       AS energies
      FROM documents
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT)                          AS n_frames,
           CAST(list_sum(energies) AS BIGINT)                AS total_energy,
           CAST(list_position(energies, list_max(energies)) - 1 AS BIGINT)
                                                             AS peak_frame,
           CAST(list_max(energies) AS BIGINT)                AS peak_energy,
           CAST(len(list_filter(energies, x -> x >= {AUDIO_ACTIVE_ENERGY}))
                AS BIGINT)                                   AS active_frames
    FROM e
    ORDER BY doc_id
    """,
    tags=("multimodal", "wav", "audio", "feature-extract", "mapInPandas"),
)
def q133_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FRAME-level feature extraction, hash-matched end to end (the
    audio analog of q124's video frame sampling): synthesize the q69 WAVs,
    decode the RIFF container, window the PCM stream into 16-sample
    frames, and verify the per-frame energy reduction — frame count,
    total energy, argmax frame + its energy, active-frame count — against
    the oracle recomputing the closed-form samples arithmetically. A
    windowing bug (off-by-one hop, tail-frame leak, ties broken late)
    shifts peak_frame or total_energy and fails the hash. Python-side
    sums stay exact: 16 samples * 2048^2 < 2^26 per frame, < 2^31 per
    document, far inside int64."""
    d = table(spark, sf_dir, "documents")
    return audio_frame_features(attach_wav_audio(d)).orderBy("doc_id")


@query(
    "q148_image_ahash_dupes",
    oracle="""
    WITH img AS (
        SELECT doc_id, (doc_id * 7) % 32 + 4 AS h FROM documents
    ), cells AS (
        SELECT doc_id,
               list_transform(range(0, 8),
                              j -> (doc_id + ((j * h) // 8)) % 256) AS v
        FROM img
    ), hashed AS (
        SELECT doc_id,
               CAST(list_reduce(
                   list_transform(range(1, 9),
                       j -> CASE WHEN v[j] * 8 >= list_reduce(v, (x, y) -> x + y)
                                 THEN CAST(2 ** (j - 1) AS BIGINT)
                                 ELSE 0 END),
                   (x, y) -> x + y) AS BIGINT) AS ahash
        FROM cells
    )
    SELECT doc_id, ahash,
           COUNT(*) OVER (PARTITION BY ahash) AS n_same_hash
    FROM hashed
    ORDER BY doc_id
    """,
    tags=("multimodal", "image", "ahash", "dedup", "llm-pipeline"),
)
def q148_image_ahash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) near-dup fingerprint over REAL
    decoded pixels — the image-side twin of text MinHash: every document's
    synthesized BMP (q67's closed-form generator) is decoded by the pure
    codec, grid-sampled to 8 rows (nearest neighbor, integer index
    arithmetic so both engines agree exactly), thresholded against the
    integer mean (v*8 >= sum comparison — no float division), and packed
    into a 64-bit-style row-bit hash; docs sharing a hash are duplicate
    candidates (n_same_hash). The oracle recomputes the hash from the
    generator's closed form — so the whole decode→sample→threshold→pack
    chain is hash-verified. The synthesized rows are constant per scan
    line, so 8 sampled rows capture the full 8x8 aHash (columns are
    redundant by construction)."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    imgs = attach_bmp_image(d)

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                w, h, rows = decode_pixels(bytes(blob))
                v = [rows[(j * h) // 8][0] for j in range(8)]
                s = sum(v)
                bits = sum((1 << j) for j in range(8) if v[j] * 8 >= s)
                out.append((int(doc_id), bits))
            yield pd.DataFrame(out, columns=["doc_id", "ahash"])

    from pyspark.sql import Window

    hashed = imgs.mapInPandas(ahash, schema="doc_id bigint, ahash bigint")
    return (
        hashed.withColumn(
            "n_same_hash", F.count("*").over(Window.partitionBy("ahash"))
        )
        .orderBy("doc_id")
    )


def silence_run_stats(
    samples: list[int], threshold: int = 512, min_run: int = 8
) -> tuple[int, int, int]:
    """Single-pass run-length walk over a PCM stream: returns
    (n_silent_samples, n_silence_segments, longest_silence_run) where a
    sample is silent iff |amplitude| < ``threshold`` and a SEGMENT is a
    maximal silent run of >= ``min_run`` samples.  A run still open at
    stream end counts (the trailing-run branch q217's unit test pins);
    a run of exactly ``min_run`` is a segment (boundary inclusive)."""
    n_silent = n_segments = longest = run = 0
    for s in samples:
        if abs(s) < threshold:
            run += 1
            n_silent += 1
            if run > longest:
                longest = run
        else:
            if run >= min_run:
                n_segments += 1
            run = 0
    if run >= min_run:
        n_segments += 1
    return n_silent, n_segments, longest


@query(
    "q217_audio_silence_segments",
    oracle="""
    WITH docs AS (
        SELECT doc_id, doc_id % 256 + 16 AS n FROM documents
    ), samples AS (
        SELECT doc_id, i,
               ((doc_id * 31 + i * 7) % 4096) - 2048 AS s
        FROM docs, unnest(range(0, n)) AS u(i)
    ), silent AS (
        SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM samples WHERE abs(s) < 512
    ), runs AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM silent GROUP BY doc_id, grp
    ), per_doc AS (
        SELECT doc_id,
               CAST(SUM(run_len) AS BIGINT) AS n_silent,
               CAST(SUM(CASE WHEN run_len >= 8 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_segments,
               CAST(MAX(run_len) AS BIGINT) AS longest_run
        FROM runs GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_samples,
           COALESCE(p.n_silent, 0) AS n_silent,
           COALESCE(p.n_segments, 0) AS n_silence_segments,
           COALESCE(p.longest_run, 0) AS longest_silence_run,
           CAST(COALESCE(p.n_silent, 0) AS DOUBLE) / CAST(d.n AS DOUBLE)
               AS silence_ratio
    FROM docs d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
    tags=("multimodal", "audio", "silence", "segmentation", "llm-pipeline"),
)
def q217_audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation over REAL decoded audio — the VAD-lite
    trim/segment pass an audio-curation pipeline runs before any model
    (drop dead air, split on pauses): every document's synthesized WAV
    (q69's closed-form generator) is decoded by the pure RIFF codec and
    its PCM stream walked for maximal runs of |amplitude| < 512;
    reported per doc: silent-sample count, number of silence SEGMENTS
    (runs ≥ 8 samples — the splittable pauses), the longest run, and
    the silence ratio. The oracle recomputes the runs arithmetically
    from the generator's closed form via gaps-and-islands SQL, so the
    decode→threshold→run-length chain is hash-verified end to end; an
    off-by-one in run detection shifts segment counts and fails the
    hash. Python-side work is a single pass per document inside the
    Arrow batch (the decode_audio_features shape); everything is exact
    integer arithmetic."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    audios = attach_wav_audio(d)

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                _rate, samples = decode_wav(bytes(blob))
                n_silent, n_segments, longest = silence_run_stats(samples)
                out.append(
                    (
                        int(doc_id),
                        len(samples),
                        n_silent,
                        n_segments,
                        longest,
                        n_silent / len(samples),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_samples",
                    "n_silent",
                    "n_silence_segments",
                    "longest_silence_run",
                    "silence_ratio",
                ],
            )

    return audios.mapInPandas(
        segs,
        schema=(
            "doc_id bigint, n_samples bigint, n_silent bigint, "
            "n_silence_segments bigint, longest_silence_run bigint, "
            "silence_ratio double"
        ),
    ).orderBy("doc_id")


def attach_shot_video(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a raw-frame video blob WITH SHOT STRUCTURE per document
    (attach_raw_video's layout plus a scene discontinuity): doc_id % 40
    + 5 frames of 64 bytes in shots of doc_id % 7 + 3 frames; byte j of
    frame i is (doc_id + 31·(i DIV shot_len) + 3·i + j) % 256 — small
    within-shot motion (+3/frame), a +31 jump at every shot change.
    Closed forms an SQL oracle can recompute, same partition-cap
    rationale as attach_bmp_image."""
    docs = spread_for_cpu(docs, cap=16)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n_frames = d % 40 + 5
                shot_len = d % 7 + 3
                blob = b"".join(
                    bytes(
                        (d + 31 * (i // shot_len) + 3 * i + j) % 256
                        for j in range(64)
                    )
                    for i in range(n_frames)
                )
                out.append((d, blob))
            yield pd.DataFrame(out, columns=["doc_id", "video"])

    return docs.select(id_col).mapInPandas(gen, schema="doc_id bigint, video binary")


SHOT_SCHEMA = "doc_id bigint, n_frames bigint, n_shots bigint, first_boundary bigint"


def detect_shot_boundaries(
    videos: DataFrame, frame_size: int = 64, threshold: int = 1500
) -> DataFrame:
    """Shot-boundary detection by consecutive-frame L1 byte distance —
    the scene-segmentation step of a video-curation pipeline (sampling
    one keyframe per SHOT beats q124's fixed-stride sampling, which
    over-samples static scenes and skips short ones). Walks the raw
    blob frame by frame (offset i·frame_size — the boundary math the
    oracle verifies), accumulates sum|b_i − b_{i−1}| over the 64-byte
    frames, and cuts where the distance exceeds ``threshold`` (within-
    shot motion bounds the L1 at 942 here; the flattest shot change
    scores 2176 — the margin the unit test pins). A real pipeline swaps
    the byte loop for decoded-luma histograms; the Arrow plumbing,
    1-blob→stats shape and threshold rule are identical."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["video"]):
                b = bytes(blob)
                n = len(b) // frame_size
                boundaries = []
                for i in range(1, n):
                    prev = b[(i - 1) * frame_size : i * frame_size]
                    cur = b[i * frame_size : (i + 1) * frame_size]
                    l1 = sum(abs(x - y) for x, y in zip(cur, prev))
                    if l1 > threshold:
                        boundaries.append(i)
                out.append(
                    (
                        int(doc_id),
                        n,
                        1 + len(boundaries),
                        boundaries[0] if boundaries else -1,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_frames", "n_shots", "first_boundary"],
            )

    return videos.mapInPandas(stats, schema=SHOT_SCHEMA)


@query(
    "q244_video_shot_boundaries",
    oracle="""
    WITH f AS (
        SELECT doc_id, doc_id % 40 + 5 AS n_frames, doc_id % 7 + 3 AS shot_len
        FROM documents
    ), diffs AS (
        SELECT f.doc_id, f.n_frames, i,
               (SELECT SUM(ABS(
                    ((f.doc_id + 31 * (i // f.shot_len) + 3 * i + j) % 256)
                  - ((f.doc_id + 31 * ((i-1) // f.shot_len) + 3 * (i-1) + j)
                     % 256)))
                FROM unnest(range(0, 64)) AS u(j)) AS l1
        FROM f, unnest(range(1, f.n_frames)) AS fr(i)
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(1 + COUNT(CASE WHEN l1 > 1500 THEN 1 END) AS BIGINT)
               AS n_shots,
           CAST(COALESCE(MIN(CASE WHEN l1 > 1500 THEN i END), -1) AS BIGINT)
               AS first_boundary
    FROM diffs
    GROUP BY doc_id, n_frames
    ORDER BY doc_id
    """,
    tags=("multimodal", "video", "shot-detection", "mapInPandas"),
)
def q244_video_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video SHOT-BOUNDARY detection, hash-matched end to end: synthesize
    a raw-frame blob with genuine shot structure (+31 scene jumps over
    +3 within-shot motion), then detect cuts from the BYTES ALONE
    (consecutive-frame L1 distance over a 1500 threshold) and
    hash-match count/first-cut against the oracle recomputing the
    closed forms arithmetically — so the frame-offset walk, the |Δ|
    accumulation and the threshold rule are verified, not assumed. The
    margin is structural (max within-shot L1 942 < min boundary L1
    2176), so detection is EXACT here: n_shots always equals
    ceil(n_frames/shot_len), which the unit test asserts independently."""
    d = table(spark, sf_dir, "documents")
    return detect_shot_boundaries(attach_shot_video(d)).orderBy("doc_id")


# --- q303: zero-crossing rate + voicing classification ------------------------

AUDIO_ZCR_SCHEMA = (
    "doc_id bigint, n_frames bigint, total_crossings bigint, "
    "max_zcr bigint, max_zcr_frame bigint, voiced_frames bigint"
)

#: frames with energy >= AUDIO_ACTIVE_ENERGY and <= this many zero
#: crossings (of 15 sample-pairs per 16-sample frame) classify "voiced" —
#: the classic energy-high/ZCR-low heuristic (Rabiner & Schafer).
AUDIO_ZCR_VOICED_MAX = 6


def audio_zcr_features(audios: DataFrame, frame_len: int = 16,
                       id_col: str = "doc_id",
                       blob_col: str = "audio") -> DataFrame:
    """ZERO-CROSSING-RATE extraction + voiced/unvoiced frame
    classification — the second classic time-domain audio feature next
    to q133's energy, and together with it the textbook
    voiced-detection pair (high energy + low ZCR = voiced; VAD nets
    replaced the rule, not the features): decode the WAV, window into
    ``frame_len``-sample frames (partial tail dropped, q133's hop
    convention), count per-frame sign changes between consecutive
    samples (sign = value < 0; a zero sample counts as non-negative —
    stated so both engines agree), and classify each frame by the
    energy/ZCR rule. All-integer arithmetic; same Arrow-batched
    mapInPandas seam as every multimodal decoder."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                _rate, samples = decode_wav(bytes(blob))
                n_frames = len(samples) // frame_len
                zcrs, energies = [], []
                for f in range(n_frames):
                    w = samples[f * frame_len:(f + 1) * frame_len]
                    zcrs.append(
                        sum(1 for a, b in zip(w, w[1:]) if (a < 0) != (b < 0))
                    )
                    energies.append(sum(s * s for s in w))
                max_zcr = max(zcrs)
                out.append((
                    int(doc_id), n_frames, sum(zcrs), max_zcr,
                    zcrs.index(max_zcr),
                    sum(
                        1
                        for z, e in zip(zcrs, energies)
                        if e >= AUDIO_ACTIVE_ENERGY and z <= AUDIO_ZCR_VOICED_MAX
                    ),
                ))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_frames", "total_crossings", "max_zcr",
                         "max_zcr_frame", "voiced_frames"],
            )

    return audios.mapInPandas(feats, schema=AUDIO_ZCR_SCHEMA)


@query(
    "q303_audio_zcr_voicing",
    oracle=f"""
    WITH z AS (
      SELECT doc_id,
             (doc_id % 256 + 16) // 16 AS n_frames,
             list_transform(range(0, (doc_id % 256 + 16) // 16),
               fr -> len(list_filter(range(fr * 16 + 1, fr * 16 + 16),
                     i -> (((doc_id * 31 + i * 7) % 4096 - 2048 < 0)
                           != ((doc_id * 31 + (i - 1) * 7) % 4096 - 2048 < 0))))
             ) AS zcrs,
             list_transform(range(0, (doc_id % 256 + 16) // 16),
               fr -> list_sum(list_transform(range(fr * 16, fr * 16 + 16),
                     i -> CAST((doc_id * 31 + i * 7) % 4096 - 2048 AS BIGINT)
                          * CAST((doc_id * 31 + i * 7) % 4096 - 2048 AS BIGINT))))
                                       AS energies
      FROM documents
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT)                            AS n_frames,
           CAST(list_sum(zcrs) AS BIGINT)                      AS total_crossings,
           CAST(list_max(zcrs) AS BIGINT)                      AS max_zcr,
           CAST(list_position(zcrs, list_max(zcrs)) - 1 AS BIGINT)
                                                               AS max_zcr_frame,
           CAST(len(list_filter(range(1, n_frames + 1),
                fr -> energies[fr] >= {AUDIO_ACTIVE_ENERGY}
                      AND zcrs[fr] <= {AUDIO_ZCR_VOICED_MAX})) AS BIGINT)
                                                               AS voiced_frames
    FROM z
    ORDER BY doc_id
    """,
    tags=("multimodal", "wav", "audio", "zcr", "vad", "mapInPandas"),
)
def q303_audio_zcr_voicing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCR + voicing report over the synthetic WAV corpus, hash-matched
    end to end: the Spark side DECODES real RIFF/PCM bytes (q69's
    writer) and extracts per-frame zero-crossing counts through the
    Arrow-batched seam; the oracle recomputes the closed-form samples
    arithmetically — a windowing bug, an off-by-one in the pair
    enumeration (15 pairs per 16-sample frame, never spanning frames),
    a wrong zero-sign convention, or a late argmax tie-break all fail
    the hash. Voiced = energy >= {AUDIO_ACTIVE_ENERGY} AND
    zcr <= {AUDIO_ZCR_VOICED_MAX} (the Rabiner–Schafer rule on exact
    integers)."""
    d = table(spark, sf_dir, "documents")
    return audio_zcr_features(attach_wav_audio(d)).orderBy("doc_id")
