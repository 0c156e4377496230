"""Multimodal column operators (extension, SURVEY §7.4).

Data model: image/audio/video are opaque ``binary`` payload columns
with typed metadata (MULTIMODAL_ASSET_SCHEMA) — parquet-native, so
100 TB of assets shard/prune like any other table and the binary
column is only read when projected.

The Spark-side plumbing (schemas, Arrow-batched ``mapInPandas``
signatures, partitioning) is real and tested.  Decode status per
modality:

- **image: REAL for binary PPM (P6), uncompressed 24-bit BMP,
  8-bit gray/truecolor PNG, and single-frame GIF** —
  :func:`decode_ppm`, :func:`decode_bmp`, :func:`decode_png` and
  :func:`decode_gif` are stdlib-only parsers (PPM: header tokenize
  incl. comments; BMP: little-endian BITMAPINFOHEADER, 4-byte row
  stride, bottom-up AND top-down rasters; PNG: chunk walk, zlib
  inflate, all five scanline filters; GIF: extension-block walk +
  a full variable-width LZW decoder — so BOTH entropy families,
  deflate and LZW, decode without PIL).
  :func:`synthesize_ppm_images` / :func:`synthesize_bmp_images` /
  :func:`synthesize_png_images` / :func:`synthesize_gif_images`
  emit genuine payloads (pure Column exprs; the PNG one computes a
  real adler32 via an ``F.aggregate`` recurrence, the GIF one a
  byte-aligned LZW stream) so all four containers are exercised
  with ``fake=False`` end-to-end.
- **audio: REAL for 16-bit PCM WAV** — :func:`decode_wav` opens the
  RIFF container with the stdlib ``wave`` module and computes PCM
  stats; :func:`synthesize_wav_audio` emits genuine WAV payloads in
  Column exprs.
- **video: REAL for uncompressed Y4M (YUV4MPEG2)** —
  :func:`decode_y4m` parses the textual stream header + per-frame
  ``FRAME`` markers and slices raw planar YUV frames (stdlib only);
  :func:`synthesize_y4m_videos` emits genuine Y4M payloads in Column
  exprs, so frame sampling runs with ``fake=False`` end-to-end.
- **FLAC audio: REAL** — :func:`decode_flac_features` drives
  ``operators/flaccodec.py`` (rice residuals, FIXED + LPC
  predictors, left/right/mid-side decorrelation, CRC-8/16 verified;
  stdlib only) with a spec-conformant FIXED-predictor encoder for
  LOSSLESS round-trip tests — compressed audio without librosa.
- **JPEG (baseline AND progressive): REAL** — :func:`decode_jpeg_features`
  drives ``operators/jpegcodec.py`` (marker parse, huffman entropy
  decode — sequential and full T.81 Annex-G progression with
  spectral selection / successive approximation / EOB runs —
  dequantize, 8×8 IDCT, 4:4:4/4:2:2/4:2:0 chroma upsample, restart
  markers; stdlib + numpy, no PIL/libjpeg), with spec-conformant
  Annex-K baseline and progressive encoders for round-trip tests.
- remaining compressed codecs (arithmetic-coded JPEG, MP3/H.264 …):
  STUBBED — the container has no ffmpeg/PIL/librosa, so
  ``decode_payload`` raises ``NotImplementedError`` unless
  ``fake=True``, which produces a deterministic md5-derived feature
  vector with the same shape a real decoder would emit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eggv_spark.schemas import MULTIMODAL_FEATURE_SCHEMA

MODALITIES = ("image", "audio", "video")
FEATURE_DIM = 8


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Build a deterministic multimodal asset table from the
    ``documents`` fixture: payload = utf-8 bytes of the text, modality
    cycles by id.  Stands in for real decoded media at the exact
    schema real assets would use."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % len(MODALITIES)).cast("int") + 1,
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime_type"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Cheap metadata pass over binary payloads — pure Column exprs
    (no decode): byte length + md5 content hash per asset."""
    return assets.select(
        "asset_id",
        "modality",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
    )


def _wav_header(n_samples: int, sample_rate: int) -> bytes:
    """Canonical 44-byte PCM WAV header (RIFF/fmt/data), 16-bit mono."""
    import struct

    data_size = n_samples * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", data_size)
    )


def synthesize_wav_audio(
    docs: DataFrame, n_samples: int = 64, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic REAL 16-bit mono PCM WAV assets from the
    ``documents`` fixture: sample ``i`` of doc ``d`` is
    ``((d*31 + i*17) % 4096) - 2048``.  The payload — a valid RIFF
    container the stdlib ``wave`` module opens — is assembled in
    Column expressions (constant header hex + per-sample
    little-endian hex + ``unhex``); no UDF."""
    header_hex = _wav_header(n_samples, sample_rate).hex()
    i_d = F.col("doc_id")

    def sample_hex(i: int):
        # two's-complement 16-bit little-endian as 4 hex chars
        v = (i_d * 31 + i * 17) % 4096 - 2048
        u = F.when(v < 0, v + 65536).otherwise(v)
        lo, hi = u % 256, (u / 256).cast("int")
        return F.concat(
            F.lpad(F.lower(F.hex(lo)), 2, "0"), F.lpad(F.lower(F.hex(hi)), 2, "0")
        )

    samples_hex = F.concat(*[sample_hex(i) for i in range(n_samples)])
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("modality"),
        F.unhex(F.concat(F.lit(header_hex), samples_hex)).alias("payload"),
        F.lit("audio/wav").alias("mime_type"),
    )


def decode_wav(payload: bytes) -> list[float]:
    """REAL WAV decode via the stdlib ``wave`` module: parse the RIFF
    container, unpack the PCM frames, emit FEATURE_DIM stats:
    ``[n_channels, sample_rate, sample_width_bits, n_frames, mean,
    rms, peak, zero_crossings]``."""
    import io
    import math
    import struct
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        n_ch, width, rate, n_frames = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        raw = w.readframes(n_frames)
    if width != 2:
        raise ValueError("only 16-bit PCM supported")
    vals = struct.unpack(f"<{n_frames * n_ch}h", raw)
    n = len(vals) or 1
    mean = sum(vals) / n
    rms = math.sqrt(sum(v * v for v in vals) / n)
    peak = float(max(abs(v) for v in vals)) if vals else 0.0
    zc = sum(1 for a, b in zip(vals, vals[1:]) if (a < 0) != (b < 0))
    return [
        float(n_ch), float(rate), float(width * 8), float(n_frames),
        mean, rms, peak, float(zc),
    ]


def synthesize_ppm_images(docs: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Deterministic REAL binary-PPM (P6) image assets from the
    ``documents`` fixture: pixel byte ``i`` of doc ``d`` is
    ``(d*7 + i*13) % 256``.  The payload is assembled entirely in
    Column expressions (hex-assemble + ``unhex``) — genuine image
    bytes, no UDF, reproducible in any engine from the same formula.
    """
    n = width * height * 3
    pix_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: F.lpad(
                F.lower(F.hex((F.col("doc_id") * 7 + i * 13) % 256)), 2, "0"
            ),
        ),
        "",
    )
    header = F.encode(F.lit(f"P6\n{width} {height}\n255\n"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.concat(header, F.unhex(pix_hex)).alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime_type"),
    )


def _ppm_parse(payload: bytes) -> tuple[int, int, int, bytes]:
    """Header-parse a binary PPM (P6): tokenize magic/width/height/
    maxval (``#`` comments allowed), slice the raster, and return
    (w, h, maxval, raster).  Shared by the feature decoder and the
    perceptual hash."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    i += 1  # exactly one whitespace byte separates maxval from raster
    raster = payload[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return w, h, maxval, raster


def decode_ppm(payload: bytes) -> list[float]:
    """REAL binary-PPM (P6) decode, stdlib only: tokenize the header
    (magic, width, height, maxval; ``#`` comments allowed), slice the
    raster, and emit FEATURE_DIM stats:
    ``[width, height, maxval, mean_r, mean_g, mean_b, max_px, min_px]``.

    The channel means divide by width*height — keep that a power of
    two and every feature value is dyadic, i.e. exactly representable
    in float32 AND reproducible by double-precision SQL engines.
    """
    w, h, maxval, raster = _ppm_parse(payload)
    n = w * h
    return [
        float(w),
        float(h),
        float(maxval),
        sum(raster[0::3]) / n,
        sum(raster[1::3]) / n,
        sum(raster[2::3]) / n,
        float(max(raster)),
        float(min(raster)),
    ]


def _bmp_header(width: int, height: int) -> bytes:
    """54-byte uncompressed 24-bit BMP header (BITMAPFILEHEADER +
    BITMAPINFOHEADER, BI_RGB, bottom-up, 2835 px/m ≈ 72 dpi)."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    raster = stride * height
    return struct.pack("<2sIHHI", b"BM", 54 + raster, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, raster, 2835, 2835, 0, 0
    )


def synthesize_bmp_images(
    docs: DataFrame, width: int = 6, height: int = 4
) -> DataFrame:
    """Deterministic REAL uncompressed-BMP image assets from the
    ``documents`` fixture: raster byte ``i`` (padding included) of
    doc ``d`` is ``(d*11 + i*17) % 256``.  The 54-byte header is a
    constant literal; the raster is hex-assembled in Column exprs and
    ``unhex``-ed — genuine little-endian BI_RGB bytes, no UDF,
    reproducible in any engine from the same formula.

    The default 6×4 geometry makes the row stride 20 with 2 padding
    bytes per row, so decoders that forget BMP's 4-byte row alignment
    fail loudly on this fixture instead of silently shearing pixels.
    """
    stride = ((width * 3 + 3) // 4) * 4
    n = stride * height
    pix_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: F.lpad(
                F.lower(F.hex((F.col("doc_id") * 11 + i * 17) % 256)), 2, "0"
            ),
        ),
        "",
    )
    header_hex = _bmp_header(width, height).hex()
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.unhex(F.concat(F.lit(header_hex), pix_hex)).alias("payload"),
        F.lit("image/bmp").alias("mime_type"),
    )


def _looks_like_bmp(payload: bytes) -> bool:
    """Content sniff beyond the 2-byte magic: 'BM' is a common
    English letter pair, so arbitrary text routed through the
    fake-decode path would otherwise be misdispatched to the real
    parser (and crash on garbage header fields).  Require a known
    DIB header size at offset 14 — a constraint no natural-language
    payload satisfies by accident."""
    return (
        payload.startswith(b"BM")
        and len(payload) >= 54
        and int.from_bytes(payload[14:18], "little")
        in (12, 40, 52, 56, 64, 108, 124)
    )


def _bmp_parse(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Header-parse an uncompressed 24-bit BMP (BI_RGB,
    BITMAPINFOHEADER or any of its larger successors): returns
    (width, height, rows) with rows in TOP-DOWN image order, each
    exactly ``3*width`` BGR bytes (stride padding removed).  A
    negative biHeight means the file is already top-down; positive
    (the common case) stores rows bottom-up."""
    if not _looks_like_bmp(payload):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    dib = int.from_bytes(payload[14:18], "little")
    if dib < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    if w <= 0 or h_raw == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h_raw}")
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    h = abs(h_raw)
    stride = ((w * 3 + 3) // 4) * 4
    if len(payload) < off + stride * h:
        raise ValueError("truncated BMP raster")
    file_rows = [
        payload[off + r * stride : off + r * stride + w * 3] for r in range(h)
    ]
    return w, h, file_rows[::-1] if h_raw > 0 else file_rows


def _raster_stats(rows: list[bytes], n: int) -> tuple[list[float], int, int]:
    """Shared per-channel stats over a 3-bytes-per-pixel raster (the
    FEATURE_DIM stat contract's mean/extrema block, one place for all
    real image decoders): returns ``([mean_c0, mean_c1, mean_c2],
    max_px, min_px)`` in the raster's own channel order."""
    sums = [0, 0, 0]
    mx, mn = 0, 255
    for row in rows:
        for c in range(3):
            sums[c] += sum(row[c::3])
        mx = max(mx, max(row))
        mn = min(mn, min(row))
    return [s / n for s in sums], mx, mn


def decode_bmp(payload: bytes) -> list[float]:
    """REAL uncompressed-BMP decode, stdlib only — the second real
    image container next to :func:`decode_ppm` (P6), proving the
    image path is a format library, not a single-format special case.
    Emits the same FEATURE_DIM stat layout as the PPM decoder:
    ``[width, height, 255, mean_r, mean_g, mean_b, max_px, min_px]``
    (means/extrema over pixel bytes only — stride padding excluded;
    BMP stores channels as BGR, re-ordered here to RGB)."""
    w, h, rows = _bmp_parse(payload)
    means, mx, mn = _raster_stats(rows, w * h)
    return [
        float(w),
        float(h),
        255.0,
        means[2],
        means[1],
        means[0],
        float(mx),
        float(mn),
    ]


def _png_parse(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse a PNG for REAL, stdlib only: validate the signature,
    walk the chunk stream, read IHDR, concatenate IDAT, ``zlib``-
    inflate, and reverse the per-scanline filters (all five: None,
    Sub, Up, Average, Paeth).  Returns ``(width, height, channels,
    rows)`` with rows top-down, each ``channels*width`` bytes.

    Supported: bit depth 8, color type 2 (truecolor, 3 channels) or
    0 (grayscale, 1 channel), no interlace — the same honest
    narrowness as the BMP parser (24-bit BI_RGB only).  Chunk CRCs
    are NOT validated: zlib's adler32 already integrity-checks the
    pixel stream, and the Column-expression synthesizer zeroes chunk
    CRCs (computing CRC32 per row in Column math buys no parse-side
    correctness)."""
    import struct
    import zlib

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("short IHDR chunk")
            width, height = struct.unpack(">II", data[:8])
            bit_depth, color_type, _c, _f, interlace = data[8:13]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    if bit_depth != 8 or color_type not in (0, 2) or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced grayscale/truecolor PNG "
            f"supported (depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace})"
        )
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    channels = 3 if color_type == 2 else 1
    stride = width * channels
    expected = height * (1 + stride)
    # Bounded inflate: a crafted IDAT can deflate ~1032:1, so an
    # unbounded zlib.decompress would materialize gigabytes from a
    # small payload BEFORE the length check — cap at expected+1 and
    # reject anything longer (decompression-bomb guard).
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG pixel stream: {exc}") from exc
    # eof required: decompressobj only validates the adler32 trailer
    # once the stream end is reached, and the synthesizer contract
    # (synthesize_png_images) depends on that check running.
    if len(raw) != expected or dec.unconsumed_tail or not dec.eof:
        raise ValueError("PNG pixel stream length mismatch")
    bpp = channels  # bytes per pixel at depth 8
    rows: list[bytes] = []
    prev = bytes(stride)
    for r in range(height):
        off = r * (1 + stride)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = bytes(line)
        rows.append(prev)
    return width, height, channels, rows


def decode_png(payload: bytes) -> list[float]:
    """REAL PNG decode, stdlib only (zlib inflate + scanline
    unfilter) — the third real image container next to
    :func:`decode_ppm` and :func:`decode_bmp`, and the first
    COMPRESSED one, so the image path covers an entropy-coded format
    without PIL.  Emits the shared FEATURE_DIM stat layout
    ``[width, height, 255, mean_r, mean_g, mean_b, max_px, min_px]``
    (grayscale replicates its single channel into all three
    means)."""
    w, h, channels, rows = _png_parse(payload)
    n = w * h
    if channels == 3:
        means, mx, mn = _raster_stats(rows, n)
    else:
        total = 0
        mx, mn = 0, 255
        for row in rows:
            total += sum(row)
            mx = max(mx, max(row))
            mn = min(mn, min(row))
        means = [total / n] * 3
    return [float(w), float(h), 255.0, *means, float(mx), float(mn)]


def _y4m_header(width: int, height: int, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """YUV4MPEG2 stream header, progressive, square pixels, C444
    (full-resolution U/V planes, so a frame is exactly 3*W*H bytes)."""
    return (
        f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 C444\n"
    ).encode("ascii")


def synthesize_y4m_videos(
    docs: DataFrame, width: int = 4, height: int = 4, n_frames: int = 4
) -> DataFrame:
    """Deterministic REAL Y4M (YUV4MPEG2, C444) video assets from the
    ``documents`` fixture: byte ``i`` of frame ``f`` of doc ``d`` is
    ``(d*7 + f*11 + i*13) % 256`` over the 3*W*H-byte planar frame.
    The payload — header, ``FRAME`` markers, raw planes — is assembled
    in Column expressions (constant hex + per-byte hex + ``unhex``);
    no UDF, reproducible in any engine from the same formula."""
    frame_len = width * height * 3
    marker_hex = b"FRAME\n".hex()

    def frame_hex(f: int):
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(frame_len - 1)),
                lambda i: F.lpad(
                    F.lower(F.hex((F.col("doc_id") * 7 + f * 11 + i * 13) % 256)),
                    2,
                    "0",
                ),
            ),
            "",
        )

    body_hex = F.concat(
        *[part for f in range(n_frames) for part in (F.lit(marker_hex), frame_hex(f))]
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        F.unhex(F.concat(F.lit(_y4m_header(width, height).hex()), body_hex)).alias(
            "payload"
        ),
        F.lit("video/x-yuv4mpeg").alias("mime_type"),
    )


def decode_y4m(payload: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """REAL Y4M decode, stdlib only: parse the ``YUV4MPEG2`` header
    tags (W/H/F/C), then walk ``FRAME`` markers slicing fixed-size raw
    planar frames.  Returns ``(width, height, fps_num, fps_den,
    frames)`` where each frame is the raw plane bytes (Y then U then V
    for C444)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = 0
    fps_num, fps_den, chroma = 25, 1, "420"
    for tag in payload[:nl].decode("ascii").split()[1:]:
        key, val = tag[0], tag[1:]
        if key == "W":
            width = int(val)
        elif key == "H":
            height = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif key == "C":
            chroma = val
    sizes = {"444": 3 * width * height, "422": 2 * width * height,
             "420": width * height * 3 // 2}
    frame_len = sizes.get(chroma[:3])
    if frame_len is None:
        raise ValueError(f"unsupported chroma subsampling C{chroma}")
    frames: list[bytes] = []
    i = nl + 1
    while i < len(payload):
        if payload[i : i + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        j = payload.index(b"\n", i)
        frame = payload[j + 1 : j + 1 + frame_len]
        if len(frame) != frame_len:
            raise ValueError("truncated Y4M frame")
        frames.append(frame)
        i = j + 1 + frame_len
    return width, height, fps_num, fps_den, frames


def decode_payload(payload: bytes, modality: str, fake: bool = False) -> list[float]:
    """Decode one media payload to a feature vector.

    Binary-PPM image payloads (magic ``P6``) are decoded FOR REAL via
    :func:`decode_ppm` regardless of ``fake``, uncompressed BMP
    (``BM``) via :func:`decode_bmp`, PNG (8-byte signature) via
    :func:`decode_png` (zlib inflate + scanline unfilter), GIF
    (``GIF87a``/``GIF89a``) via :func:`decode_gif` (full
    variable-width LZW); likewise WAV (``RIFF``) via
    :func:`decode_wav` and Y4M video (``YUV4MPEG2``) via
    :func:`decode_y4m`; baseline and progressive JPEG (``FF D8``) via
    :func:`decode_jpeg_features` (operators/jpegcodec.py — huffman +
    IDCT, stdlib + numpy).  The remaining compressed formats
    (arithmetic-coded JPEG, MP3/H.264 classes) need PIL/librosa/ffmpeg,
    which this environment does not ship:
    ``fake=True`` derives a deterministic FEATURE_DIM-float vector
    from the md5 digest — shape-compatible with a real embedding so
    the distributed plumbing is exercised end-to-end.
    """
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    # Container variants the stdlib parsers honestly decline
    # (BITMAPCOREHEADER/compressed BMP, palette / 16-bit / interlaced
    # PNG, interlaced GIF) keep the documented fake=True stand-in
    # instead of crashing the task; corrupt payloads (ValueError)
    # still raise — a silent garbage vector on bad data is worse than
    # a failed task.
    if _looks_like_bmp(payload):
        try:
            return decode_bmp(payload)
        except NotImplementedError:
            if not fake:
                raise
    elif payload.startswith(b"\x89PNG\r\n\x1a\n"):
        try:
            return decode_png(payload)
        except NotImplementedError:
            if not fake:
                raise
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return decode_gif(payload)
        except NotImplementedError:
            if not fake:
                raise
    elif payload[:2] == b"\xff\xd8":
        try:
            return decode_jpeg_features(payload)
        except NotImplementedError:
            if not fake:
                raise
    if payload.startswith(b"RIFF"):
        return decode_wav(payload)
    if payload.startswith(b"fLaC"):
        try:
            return decode_flac_features(payload)
        except NotImplementedError:
            if not fake:
                raise
    if payload.startswith(b"YUV4MPEG2"):
        w, h, fps_num, fps_den, frames = decode_y4m(payload)
        plane = w * h
        n = len(frames) or 1

        def plane_mean(offset: int) -> float:
            return sum(
                sum(fr[offset : offset + plane]) for fr in frames
            ) / (plane * n)

        return [
            float(w), float(h), fps_num / fps_den, float(len(frames)),
            plane_mean(0), plane_mean(plane), plane_mean(2 * plane),
            sum(sum(fr) for fr in frames) / (3 * plane * n),
        ]
    if not fake:
        raise NotImplementedError(
            f"real {modality} decoding requires media libraries not "
            "available in this environment; pass fake=True for the "
            "deterministic stand-in (PPM/BMP/PNG/GIF images, WAV "
            "audio, and Y4M video decode for real)"
        )
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(
    assets: DataFrame,
    fake_decode: bool = True,
    decoder: Callable[[bytes, str, bool], list[float]] = decode_payload,
) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    ``mapInPandas``.

    Why mapInPandas (not a scalar pandas UDF): a real decoder wants
    per-batch library setup (model weights, codec contexts), which
    amortizes across each Arrow batch; and the 1->1 row mapping can
    become 1->N (e.g. video frame sampling) without changing operator
    shape.  Batch size follows
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "modality": batch["modality"],
                    "n_bytes": batch["payload"].map(len).astype("int64"),
                    # md5 of the LOWERCASE HEX of the payload, not the
                    # raw bytes: engines whose md5 is VARCHAR-only
                    # (DuckDB) can reproduce it via md5(lower(hex(b))).
                    "content_hash": batch["payload"].map(
                        lambda b: hashlib.md5(bytes(b).hex().encode()).hexdigest()
                    ),
                    "feature": [
                        decoder(p, m, fake_decode)
                        for p, m in zip(batch["payload"], batch["modality"])
                    ],
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        _extract, MULTIMODAL_FEATURE_SCHEMA
    )


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a binary PPM (P6), stdlib
    only — no PIL.  Destination pixel (x, y) samples source pixel
    ``(x * src_w // width, y * src_h // height)`` (floor mapping, the
    classic integer nearest-neighbor; note PIL centers samples at
    ``(x + 0.5) * scale`` so its output differs by half a pixel).
    Returns a complete new P6 payload (header + raster) so the result
    is itself a decodable image.
    """
    src_w, src_h, maxval, raster = _ppm_parse(payload)
    out = bytearray(width * height * 3)
    pos = 0
    for y in range(height):
        sy = y * src_h // height
        row = sy * src_w
        for x in range(width):
            si = (row + x * src_w // width) * 3
            out[pos : pos + 3] = raster[si : si + 3]
            pos += 3
    return f"P6\n{width} {height}\n{maxval}\n".encode("ascii") + bytes(out)


def crop_ppm(payload: bytes, x0: int, y0: int, width: int, height: int) -> bytes:
    """REAL crop of a binary PPM (P6), stdlib only: slice the
    ``width``×``height`` pixel window anchored at (``x0``, ``y0``)
    out of the raster and re-emit a complete P6 payload.  The window
    is clamped to the source bounds (a crop that hangs off the edge
    shrinks rather than erroring — the behavior batch pipelines want
    when metadata and pixels disagree slightly)."""
    src_w, src_h, maxval, raster = _ppm_parse(payload)
    x0 = max(0, min(x0, src_w))
    y0 = max(0, min(y0, src_h))
    w = max(0, min(width, src_w - x0))
    h = max(0, min(height, src_h - y0))
    rows = [
        raster[((y0 + r) * src_w + x0) * 3 : ((y0 + r) * src_w + x0 + w) * 3]
        for r in range(h)
    ]
    return f"P6\n{w} {h}\n{maxval}\n".encode("ascii") + b"".join(rows)


def crop_images(
    assets: DataFrame,
    x0: int,
    y0: int,
    width: int,
    height: int,
) -> DataFrame:
    """Image crop over binary P6 payloads (mapInPandas, 1->1) — the
    REAL pixel-slice path via :func:`crop_ppm`; non-PPM payloads
    raise (cropping a compressed format needs PIL, which this
    environment does not ship).  Same operator shape as
    :func:`resize_images`: Arrow-batched, schema-stable, and the
    emitted payload is itself a decodable P6 image."""

    def _crop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            cropped = [
                crop_ppm(bytes(p), x0, y0, width, height)
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "x0": x0,
                    "y0": y0,
                    "cropped": cropped,
                }
            )

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(_crop, "asset_id long, x0 int, y0 int, cropped binary")
    )


def decimate_wav(payload: bytes, factor: int) -> bytes:
    """REAL WAV downsample by integer decimation, stdlib only: keep
    every ``factor``-th 16-bit PCM sample and re-emit a valid RIFF
    container at ``sample_rate / factor``.  (Plain decimation aliases
    high frequencies — a production resampler low-pass-filters first;
    this is the deterministic skeleton that keeps the container
    valid, which is what the distributed plumbing needs.)"""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width != 2 or n_ch != 1:
        raise ValueError("only 16-bit mono PCM supported")
    kept = b"".join(raw[i : i + 2] for i in range(0, len(raw), 2 * factor))
    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate // factor)
        w.writeframes(kept)
    return out.getvalue()


def resample_audio(assets: DataFrame, factor: int = 2) -> DataFrame:
    """Audio downsample over binary WAV payloads (mapInPandas, 1->1)
    via :func:`decimate_wav` — REAL for 16-bit mono PCM; anything
    else raises (compressed audio needs librosa/ffmpeg)."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            resampled = [
                decimate_wav(bytes(p), factor) for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "factor": factor,
                    "resampled": resampled,
                }
            )

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(
            _resample, "asset_id long, factor int, resampled binary"
        )
    )


def resize_images(
    assets: DataFrame,
    width: int = 64,
    height: int = 64,
    fake_decode: bool = True,
) -> DataFrame:
    """Image resize over binary payloads (mapInPandas, 1->1).

    Binary-PPM (P6) payloads are resized FOR REAL via
    :func:`resize_ppm` (stdlib nearest-neighbor) regardless of
    ``fake_decode``.  Compressed formats would need PIL, which this
    environment does not ship: with ``fake_decode=True`` the
    "resized" payload is a deterministic digest expansion of
    (payload, w, h) with the byte length a real w×h×3 RGB buffer
    would have — so downstream size accounting, shuffle volume, and
    schema handling stay realistic; with ``fake_decode=False``
    non-PPM payloads raise ``NotImplementedError``.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target_len = width * height * 3
        for batch in batches:
            resized = []
            for payload in batch["payload"]:
                payload = bytes(payload)
                if payload.startswith(b"P6"):
                    try:
                        resized.append(resize_ppm(payload, width, height))
                        continue
                    except ValueError:
                        # "P6"-prefixed but not a parseable PPM (e.g. a
                        # text payload): fall through to the stub/raise.
                        if not fake_decode:
                            raise
                if not fake_decode:
                    raise NotImplementedError(
                        "real resize of non-PPM images needs PIL"
                    )
                else:
                    seed = hashlib.md5(
                        payload + f"{width}x{height}".encode()
                    ).digest()
                    resized.append(
                        (seed * (target_len // len(seed) + 1))[:target_len]
                    )
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            _resize, "asset_id long, width int, height int, resized binary"
        )
    )


def sample_video_frames(
    assets: DataFrame, n_frames: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling for video assets: 1->N row expansion inside
    mapInPandas.

    Y4M payloads (magic ``YUV4MPEG2``) are decoded FOR REAL via
    :func:`decode_y4m` regardless of ``fake_decode``: up to
    ``n_frames`` frames are sampled evenly across the stream
    (``frame_idx`` is the SOURCE frame index), ``frame_hash`` is the
    md5 of the lowercase hex of the raw frame bytes (engine-portable
    — DuckDB reproduces it as ``md5(<hex string>)``), and ``mean_y``
    is the decoded luma-plane mean.  Other containers need ffmpeg:
    with ``fake_decode=True`` the hash is a deterministic digest
    stand-in and ``mean_y`` is null."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "asset_id": [], "frame_idx": [], "frame_hash": [], "mean_y": []
            }
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                payload = bytes(payload)
                if payload.startswith(b"YUV4MPEG2"):
                    w, h, _, _, frames = decode_y4m(payload)
                    total = len(frames)
                    k = min(n_frames, total)
                    for j in range(k):
                        fi = j * total // k
                        frame = frames[fi]
                        out["asset_id"].append(asset_id)
                        out["frame_idx"].append(fi)
                        out["frame_hash"].append(
                            hashlib.md5(frame.hex().encode()).hexdigest()
                        )
                        out["mean_y"].append(sum(frame[: w * h]) / (w * h))
                    continue
                if not fake_decode:
                    raise NotImplementedError("real frame sampling needs ffmpeg")
                for i in range(n_frames):
                    out["asset_id"].append(asset_id)
                    out["frame_idx"].append(i)
                    # printable-ASCII frame salt (not a raw byte): keeps
                    # the stub hash reproducible in engines whose hash
                    # functions reject NUL bytes in strings
                    out["frame_hash"].append(
                        hashlib.md5(payload + f"#{i}".encode()).hexdigest()
                    )
                    out["mean_y"].append(None)
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "payload")
        .mapInPandas(
            _sample,
            "asset_id long, frame_idx int, frame_hash string, mean_y double",
        )
    )


def ahash_ppm(payload: bytes) -> tuple[int, int]:
    """Perceptual average-hash of a binary PPM: per-pixel brightness
    (r+g+b, INTEGER — no division), threshold at the image mean, and
    pack the bits MSB-first in raster order.  Returns
    (n_pixels, hash).

    All-integer formulation (``3n·brightness_i >= Σ brightness`` is
    evaluated as ``brightness_i · n >= total``) so the hash is
    bit-exact across engines — the DuckDB oracle reproduces it from
    the synthetic pixel formula with integer shifts only, no float
    threshold ambiguity.
    """
    w, h, _maxval, raster = _ppm_parse(payload)
    n = w * h
    sums = [
        raster[3 * i] + raster[3 * i + 1] + raster[3 * i + 2]
        for i in range(n)
    ]
    total = sum(sums)
    hval = 0
    for i, s in enumerate(sums):
        hval = (hval << 1) | (1 if s * n >= total else 0)
    return n, hval


def image_ahash(assets: DataFrame) -> DataFrame:
    """Per-image perceptual hash over REAL decoded bytes
    (Arrow-batched ``mapInPandas``, stdlib P6 decoder — no fake
    path): the pre-filter key for image near-dup detection.  Images
    whose aHash collides are near-duplicate CANDIDATES; exact
    verification (pixel distance) runs only within hash buckets —
    the same bucket-then-verify shape as the text MinHash path, so
    a billion-image corpus never forms all pairs.
    """

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            pairs = [ahash_ppm(bytes(p)) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "n_pixels": [p[0] for p in pairs],
                    "ahash": [p[1] for p in pairs],
                }
            )

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(_hash, "asset_id long, n_pixels int, ahash long")
    )


def audio_rms_segments(
    assets: DataFrame, window_samples: int = 16
) -> DataFrame:
    """Audio segmentation over REAL decoded PCM (stdlib ``wave``
    parse inside Arrow-batched ``mapInPandas``, 1→N): fixed-size
    sample windows with per-segment RMS and peak — the front-end of
    silence trimming, loudness normalization, and voice-activity
    gating in audio training pipelines.

    Per segment: rms = sqrt(Σv²/n) over 16-bit integer samples —
    integer sums are exact in doubles at any realistic window size,
    so the 4dp-rounded values reproduce bit-identically in SQL.
    """
    import io
    import math
    import struct
    import wave

    def _segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "asset_id": [], "segment_idx": [],
                "n_samples": [], "rms": [], "peak": [],
            }
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    raw = w.readframes(w.getnframes())
                vals = struct.unpack(f"<{len(raw) // 2}h", raw)
                for s in range(0, len(vals), window_samples):
                    seg = vals[s : s + window_samples]
                    out["asset_id"].append(asset_id)
                    out["segment_idx"].append(s // window_samples)
                    out["n_samples"].append(len(seg))
                    out["rms"].append(
                        round(math.sqrt(sum(v * v for v in seg) / len(seg)), 4)
                    )
                    out["peak"].append(max(abs(v) for v in seg))
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(
            _segments,
            "asset_id long, segment_idx int, n_samples int,"
            " rms double, peak int",
        )
    )


def synthesize_png_headers(docs: DataFrame) -> DataFrame:
    """Deterministic PNG assets (signature + IHDR chunk) from the
    ``documents`` fixture: width = 1 + doc_id % 64, height = 1 +
    (doc_id * 7) % 48, bit depth 8, color type 2 (truecolor).  The
    bytes are hex-assembled in Column exprs and ``unhex``-ed — a
    genuine big-endian PNG header any parser can read.  The IHDR CRC
    is zeroed (header PARSING never validates CRC; writing a real
    CRC32 would need a per-row UDF for no parse-side gain) and no
    IDAT follows — this fixture exercises metadata extraction, the
    step a 100 TB image pipeline runs BEFORE any decode."""
    w = 1 + F.col("doc_id") % 64
    h = 1 + (F.col("doc_id") * 7) % 48
    hex4 = lambda c: F.lpad(F.lower(F.hex(c)), 8, "0")
    ihdr = F.concat(
        F.lit("0000000d"),            # length 13
        F.lit("49484452"),            # "IHDR"
        hex4(w), hex4(h),
        F.lit("08"),                  # bit depth
        F.lit("02"),                  # color type: truecolor
        F.lit("000000"),              # compression/filter/interlace
        F.lit("00000000"),            # CRC (zeroed, see docstring)
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.unhex(F.concat(F.lit("89504e470d0a1a0a"), ihdr)).alias("payload"),
        F.lit("image/png").alias("mime_type"),
    )


def synthesize_png_images(
    docs: DataFrame, width: int = 6, height: int = 4
) -> DataFrame:
    """Deterministic REAL decodable PNG assets from the ``documents``
    fixture — pure Column exprs, no UDF, reproducible in any engine
    from the same formulas.  Raster byte ``j`` of row ``r`` of doc
    ``d`` is ``(d*11 + r*19 + j*17) % 256`` (RGB, 3*width bytes per
    row, filter type 0 per scanline).

    The IDAT zlib stream uses one STORED deflate block (header
    ``78 01``, block ``01 LEN NLEN``) so the byte layout is
    expressible in Column math — but the adler32 trailer is computed
    FOR REAL with an ``F.aggregate`` recurrence over the scanline
    bytes (``a = (a+byte) % 65521; b = (b+a) % 65521``), because
    ``zlib.decompress`` validates it; these payloads round-trip
    through :func:`decode_png` with no special-casing.  Chunk CRCs
    are zeroed (documented non-validated in :func:`_png_parse`).
    Stored-block limit: ``height*(1+3*width)`` must be <= 65535."""
    import struct

    stride = 3 * width
    dl = height * (1 + stride)  # filter byte + raster, per row
    if dl > 0xFFFF:
        raise ValueError("fixture raster exceeds one stored block")

    row_len = 1 + stride
    idx = F.sequence(F.lit(0), F.lit(dl - 1))
    byte_at = lambda i: F.when((i % row_len) == 0, F.lit(0)).otherwise(
        (
            F.col("doc_id") * 11
            + F.floor(i / row_len) * 19
            + ((i % row_len) - 1) * 17
        )
        % 256
    )
    data_hex = F.array_join(
        F.transform(
            idx, lambda i: F.lpad(F.lower(F.hex(byte_at(i))), 2, "0")
        ),
        "",
    )
    adler = F.aggregate(
        idx,
        F.struct(
            F.lit(1).cast("long").alias("a"), F.lit(0).cast("long").alias("b")
        ),
        lambda acc, i: F.struct(
            ((acc["a"] + byte_at(i)) % 65521).alias("a"),
            ((acc["b"] + acc["a"] + byte_at(i)) % 65521).alias("b"),
        ),
        lambda acc: acc["b"] * 65536 + acc["a"],
    )
    adler_hex = F.lpad(F.lower(F.hex(adler)), 8, "0")

    ihdr = (
        struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        + b"\x00\x00\x00\x00"  # CRC zeroed
    )
    # IDAT = zlib header + stored-block header + data + adler32
    idat_len = 2 + 5 + dl + 4
    idat_head = (
        struct.pack(">I", idat_len)
        + b"IDAT"
        + b"\x78\x01"
        + b"\x01"
        + struct.pack("<HH", dl, dl ^ 0xFFFF)
    )
    iend = struct.pack(">I", 0) + b"IEND" + b"\x00\x00\x00\x00"

    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.unhex(
            F.concat(
                F.lit((b"\x89PNG\r\n\x1a\n" + ihdr + idat_head).hex()),
                data_hex,
                adler_hex,
                F.lit((b"\x00\x00\x00\x00" + iend).hex()),  # IDAT CRC + IEND
            )
        ).alias("payload"),
        F.lit("image/png").alias("mime_type"),
    )


def parse_png_header(assets: DataFrame) -> DataFrame:
    """Header-parse PNG payloads WITHOUT decoding: validate the
    8-byte signature and the IHDR chunk type, then read width,
    height, bit depth, and color type straight out of the big-endian
    header bytes.  Pure substring/hex/conv Column math — JVM-side,
    codegen'd, zero Python — the shape of metadata extraction you
    want when filtering a 100 TB image corpus down before the
    (expensive, UDF-side) pixel decode."""
    pay = F.col("payload")
    sig_ok = F.hex(F.substring(pay, 1, 8)) == "89504E470D0A1A0A"
    type_ok = F.hex(F.substring(pay, 13, 4)) == "49484452"
    be32 = lambda off: F.conv(F.hex(F.substring(pay, off, 4)), 16, 10).cast(
        "long"
    )
    be8 = lambda off: F.conv(F.hex(F.substring(pay, off, 1)), 16, 10).cast(
        "int"
    )
    ok = sig_ok & type_ok
    return assets.select(
        "asset_id",
        ok.cast("int").alias("header_ok"),
        F.when(ok, be32(17)).alias("width"),
        F.when(ok, be32(21)).alias("height"),
        F.when(ok, be8(25)).alias("bit_depth"),
        F.when(ok, be8(26)).alias("color_type"),
    )


def detect_scene_cuts(
    frames: DataFrame, threshold: float = 5.0
) -> DataFrame:
    """Scene-cut detection over decoded frame statistics: a cut is a
    frame whose luma mean jumps more than ``threshold`` from the
    previous frame of the same asset.  Runs on the OUTPUT of
    :func:`sample_video_frames` (the expensive decode happens once,
    in its Arrow-batched UDF; this is a pure lag-window over the
    small per-frame stats frame — the split every large-scale video
    pipeline makes).  Returns per-asset totals and the first cut."""
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    delta = F.abs(F.col("mean_y") - F.lag("mean_y").over(w))
    flagged = frames.withColumn("_cut", (delta > threshold).cast("int"))
    return flagged.groupBy("asset_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.coalesce("_cut", F.lit(0))).alias("n_cuts"),
        F.min(F.when(F.col("_cut") == 1, F.col("frame_idx"))).alias(
            "first_cut_idx"
        ),
    )


# ---- GIF (LZW-compressed, stdlib decode) -----------------------------------


def _gif_color_table(n: int) -> bytes:
    """Deterministic ``3*n``-byte palette shared by the synthesizer
    and tests: entry ``k`` -> ``(2k % 256, (255-2k) % 256,
    (7k+3) % 256)``."""
    out = bytearray()
    for k in range(n):
        out += bytes(((2 * k) % 256, (255 - 2 * k) % 256, (7 * k + 3) % 256))
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> list[int]:
    """REAL GIF-variant LZW decompression, stdlib only: LSB-first bit
    reader, variable code width starting at ``min_code + 1``,
    CLEAR/EOI handling, dictionary growth with a width bump when the
    next free slot reaches ``2**width`` (no early change, per the GIF
    spec) and the 12-bit cap with deferred clear.  Returns the pixel
    index stream; ``n_expected`` only bounds runaway corrupt streams.
    """
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = eoi + 1
    # Width-bump bookkeeping is a CODES-READ counter, not the table
    # size: the decoder's table lags the encoder's by exactly one
    # entry at read time (the encoder inserts before emitting the
    # next code; the decoder only learns that entry from the next
    # code), so bumping on table size would switch width one code too
    # late.  Counting codes read — one prospective slot per code —
    # and bumping when the counter passes 2**width reproduces the
    # de-facto standard (giflib's RunningCode/MaxCode1) exactly.
    running = eoi + 1
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            running += 1
            if running > (1 << width) and width < 12:
                width += 1
            if code == clear:
                table = {i: (i,) for i in range(clear)}
                next_code = eoi + 1
                width = min_code + 1
                running = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None or len(entry) != 1:
                    raise ValueError("LZW stream starts on a non-root code")
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                # the KwKwK case: the code being defined right now
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt LZW stream: code beyond table")
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
            out.extend(entry)
            prev = entry
            if len(out) > n_expected:
                raise ValueError("LZW stream decodes past the raster size")
    raise ValueError("LZW stream ended without an EOI code")


def _gif_parse(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a GIF for REAL, stdlib only: validate the GIF87a/GIF89a
    signature, read the logical screen descriptor and global color
    table, skip 0x21 extension blocks (sub-block walk), read the
    first image descriptor, gather the data sub-blocks, and
    LZW-decompress via :func:`_lzw_decode`.  Returns ``(width,
    height, rows)`` with rows top-down, each ``3*width`` RGB bytes
    through the active (global or local) color table.

    Supported: single-frame, non-interlaced images — the same honest
    narrowness as the other stdlib parsers (no animation
    compositing, no transparency blending)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    table = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        table = payload[pos : pos + 3 * n]
        if len(table) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x2C:
            break
        if block == 0x21:  # extension: introducer, label, sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x3B:
            raise ValueError("GIF has no image data")
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    else:
        raise ValueError("GIF has no image data")
    if pos + 10 > len(payload):
        raise ValueError("truncated GIF image descriptor")
    width = int.from_bytes(payload[pos + 5 : pos + 7], "little")
    height = int.from_bytes(payload[pos + 7 : pos + 9], "little")
    ipacked = payload[pos + 9]
    pos += 10
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIFs not supported")
    if ipacked & 0x80:  # local color table overrides the global one
        n = 2 ** ((ipacked & 0x07) + 1)
        table = payload[pos : pos + 3 * n]
        if len(table) != 3 * n:
            raise ValueError("truncated local color table")
        pos += 3 * n
    if table is None:
        raise ValueError("GIF image has no color table")
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid GIF dimensions {width}x{height}")
    if pos >= len(payload):
        raise ValueError("truncated GIF image data")
    min_code = payload[pos]
    pos += 1
    if not 2 <= min_code <= 11:
        raise ValueError(f"invalid LZW minimum code size {min_code}")
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("unterminated GIF data sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        chunk = payload[pos : pos + ln]
        if len(chunk) != ln:
            raise ValueError("truncated GIF data sub-block")
        data += chunk
        pos += ln
    indices = _lzw_decode(bytes(data), min_code, width * height)
    if len(indices) != width * height:
        raise ValueError(
            f"LZW stream decoded {len(indices)} pixels, "
            f"raster needs {width * height}"
        )
    ncolors = len(table) // 3
    if max(indices) >= ncolors:
        raise ValueError("pixel index outside the color table")
    rows: list[bytes] = []
    for r in range(height):
        row = bytearray()
        for c in indices[r * width : (r + 1) * width]:
            row += table[3 * c : 3 * c + 3]
        rows.append(bytes(row))
    return width, height, rows


def decode_gif(payload: bytes) -> list[float]:
    """REAL GIF decode, stdlib only (full variable-width LZW) — the
    fourth real image container next to :func:`decode_ppm`,
    :func:`decode_bmp` and :func:`decode_png`, and the first
    DICTIONARY-CODED one, so the image path covers both entropy
    families (deflate and LZW) without PIL.  Emits the shared
    FEATURE_DIM stat layout ``[width, height, 255, mean_r, mean_g,
    mean_b, max_px, min_px]`` over the palette-resolved RGB
    raster."""
    w, h, rows = _gif_parse(payload)
    means, mx, mn = _raster_stats(rows, w * h)
    return [float(w), float(h), 255.0, *means, float(mx), float(mn)]


def synthesize_gif_images(
    docs: DataFrame, width: int = 6, height: int = 4
) -> DataFrame:
    """Deterministic REAL decodable GIF87a assets from the
    ``documents`` fixture — pure Column exprs, no UDF.  Pixel index
    ``i`` of doc ``d`` is ``(d*13 + i*29) % 128`` over the shared
    128-entry global color table (:func:`_gif_color_table`).

    The LZW stream uses the byte-aligned degenerate encoding — the
    LZW analog of the PNG synthesizer's stored-deflate trick: with a
    7-bit palette the initial code width is 8, so under LSB-first
    packing every root code IS its own byte; a CLEAR (0x80) before
    every 100th pixel keeps the dictionary under 256 entries so the
    width never grows, and EOI (0x81) terminates.  A real LZW decoder
    consumes the stream unmodified (:func:`decode_gif` round-trips
    these payloads with no special-casing).  Fixture cap: pixels +
    clears + EOI must fit one 255-byte data sub-block."""
    import struct

    n = width * height
    n_stream = n + (n + 99) // 100 + 1
    if n_stream > 255:
        raise ValueError("fixture stream exceeds one GIF data sub-block")
    # logical screen descriptor packed byte: GCT flag, color
    # resolution 7, sort 0, GCT size bits 6 (2^(6+1) = 128 entries)
    header = (
        b"GIF87a"
        + struct.pack("<HH", width, height)
        + bytes((0x80 | 0x70 | 0x06, 0, 0))
        + _gif_color_table(128)
        + b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + bytes((7, n_stream))  # LZW min code size, sub-block length
    )
    idx = F.sequence(F.lit(0), F.lit(n - 1))
    stream_hex = F.array_join(
        F.transform(
            idx,
            lambda i: F.concat(
                F.when(i % 100 == 0, F.lit("80")).otherwise(F.lit("")),
                F.lpad(
                    F.lower(F.hex((F.col("doc_id") * 13 + i * 29) % 128)),
                    2,
                    "0",
                ),
            ),
        ),
        "",
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.unhex(
            F.concat(F.lit(header.hex()), stream_hex, F.lit("81003b"))
        ).alias("payload"),
        F.lit("image/gif").alias("mime_type"),
    )


def image_patches(
    assets: DataFrame, patch: int = 4
) -> DataFrame:
    """ViT-style patch extraction over REAL decoded pixels (stdlib P6
    decode inside Arrow-batched ``mapInPandas``, 1→N): split each
    image into non-overlapping ``patch``×``patch`` tiles and emit
    per-tile per-channel means — the patch-embedding front-end shape
    (each row is one pre-projection patch), plus the tile grid
    coordinates a masking/augmentation stage needs.

    Keep ``patch`` a power of two: each mean divides an integer byte
    sum by patch² (dyadic), so the values reproduce bit-identically
    in double-precision SQL.  Images whose dimensions are not
    multiples of ``patch`` raise — silent partial tiles would shift
    every downstream position embedding.  Staged for the round-8
    registry window."""

    def _patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "asset_id": [], "patch_row": [], "patch_col": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                w, h, _maxval, raster = _ppm_parse(bytes(payload))
                if w % patch or h % patch:
                    raise ValueError(
                        f"image {asset_id}: {w}x{h} not a multiple of "
                        f"patch={patch}"
                    )
                n = patch * patch
                for pr in range(h // patch):
                    for pc in range(w // patch):
                        sums = [0, 0, 0]
                        for dy in range(patch):
                            row0 = ((pr * patch + dy) * w + pc * patch) * 3
                            for dx in range(patch):
                                o = row0 + dx * 3
                                sums[0] += raster[o]
                                sums[1] += raster[o + 1]
                                sums[2] += raster[o + 2]
                        out["asset_id"].append(asset_id)
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["mean_r"].append(sums[0] / n)
                        out["mean_g"].append(sums[1] / n)
                        out["mean_b"].append(sums[2] / n)
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            _patches,
            "asset_id long, patch_row int, patch_col int,"
            " mean_r double, mean_g double, mean_b double",
        )
    )


def image_channel_hist(
    assets: DataFrame, n_bins: int = 4
) -> DataFrame:
    """Per-channel pixel-intensity histograms over REAL decoded P6
    pixels (stdlib decode inside Arrow-batched ``mapInPandas``,
    1→N): each image emits ``3·n_bins`` rows of (channel, bin,
    count) — the exposure/color-cast audit a vision-data curation
    pass runs before training (a channel whose mass sits in one bin
    is a blank/clipped asset).

    ``n_bins`` must divide 256 so bin edges are exact integers
    (``bin = pixel // (256/n_bins)``) and the counts reproduce
    bit-identically from the synthesis formula in SQL.  Unsupported
    payloads raise loudly (no silent skips).  Staged for the round-9
    registry window."""
    if 256 % n_bins:
        raise ValueError(f"n_bins={n_bins} must divide 256")
    width = 256 // n_bins

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "asset_id": [], "channel": [], "bin": [], "n_px": [],
            }
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                _w, _h, _maxval, raster = _ppm_parse(bytes(payload))
                for ch, name in enumerate(("r", "g", "b")):
                    counts = [0] * n_bins
                    for px in raster[ch::3]:
                        counts[px // width] += 1
                    for b, c in enumerate(counts):
                        out["asset_id"].append(asset_id)
                        out["channel"].append(name)
                        out["bin"].append(b)
                        out["n_px"].append(c)
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            _hist,
            "asset_id long, channel string, bin int, n_px long",
        )
    )


def audio_silence_report(
    assets: DataFrame, threshold: int = 512
) -> DataFrame:
    """Silence audit over REAL 16-bit PCM WAV payloads (stdlib
    ``wave`` decode inside Arrow-batched ``mapInPandas``): per asset,
    the sample count, how many samples sit under the absolute
    amplitude ``threshold``, the silence ratio, and the
    leading/trailing silence run lengths — the trim-points a speech
    curation pass computes before feature extraction (an asset that
    is 95% silence is a recording error, not training data).

    All outputs are exact integers (plus one 4dp ratio), so the
    report reproduces bit-identically from the synthesis formula in
    SQL.  Unsupported payloads raise loudly.  Staged for the round-9
    registry window."""

    def _report(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import struct
        import wave

        def _round4(x: float) -> float:
            # HALF-UP, not Python's banker's rounding: n/64-style
            # ratios land exactly on .5 at 4dp (k*156.25), where
            # round-half-even diverges from SQL round()
            return math.floor(x * 10000 + 0.5) / 10000

        for batch in batches:
            out: dict[str, list] = {
                "asset_id": [], "n_samples": [], "n_silent": [],
                "silence_ratio": [], "lead_silence": [],
                "trail_silence": [],
            }
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("only 16-bit PCM supported")
                    n = w.getnframes() * w.getnchannels()
                    vals = struct.unpack(f"<{n}h", w.readframes(w.getnframes()))
                silent = [abs(v) < threshold for v in vals]
                n_sil = sum(silent)
                lead = next(
                    (i for i, s in enumerate(silent) if not s), len(vals)
                )
                trail = next(
                    (i for i, s in enumerate(reversed(silent)) if not s),
                    len(vals),
                )
                out["asset_id"].append(asset_id)
                out["n_samples"].append(len(vals))
                out["n_silent"].append(n_sil)
                out["silence_ratio"].append(
                    _round4(n_sil / len(vals)) if vals else 0.0
                )
                out["lead_silence"].append(lead)
                out["trail_silence"].append(trail)
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(
            _report,
            "asset_id long, n_samples long, n_silent long,"
            " silence_ratio double, lead_silence long,"
            " trail_silence long",
        )
    )


def image_entropy_report(assets: DataFrame) -> DataFrame:
    """Intensity-entropy audit over REAL decoded P6 rasters (stdlib
    decode inside Arrow-batched ``mapInPandas``): per image, the
    Shannon entropy of the raw byte-intensity distribution across all
    channels, the distinct-intensity count, and the modal intensity's
    share — the blank/synthetic-asset detector a vision curation pass
    runs (a near-zero-entropy image is a solid fill or a clipped
    exposure, not training signal; the text twin is
    ``text_analysis.token_entropy``).

    Determinism: the entropy fold iterates the histogram in SORTED
    intensity order (pinned summation order); counts are exact
    integers; entropy and max_share round HALF-UP at 4dp (the
    ``audio_silence_report`` rule — Python round() is banker's and
    k/n grids land exactly on .5 at 4dp).  Unsupported payloads raise
    loudly."""

    def _report(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def _round4(x: float) -> float:
            return math.floor(x * 10000 + 0.5) / 10000

        for batch in batches:
            out: dict[str, list] = {
                "asset_id": [], "n_bytes": [], "n_distinct": [],
                "entropy": [], "max_share": [],
            }
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                _w, _h, _maxval, raster = _ppm_parse(bytes(payload))
                n = len(raster)
                counts: dict[int, int] = {}
                for px in raster:
                    counts[px] = counts.get(px, 0) + 1
                h = 0.0
                for _v, c in sorted(counts.items()):
                    p = c / n
                    h -= p * math.log(p)
                out["asset_id"].append(asset_id)
                out["n_bytes"].append(n)
                out["n_distinct"].append(len(counts))
                out["entropy"].append(_round4(h))
                out["max_share"].append(_round4(max(counts.values()) / n))
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            _report,
            "asset_id long, n_bytes long, n_distinct long,"
            " entropy double, max_share double",
        )
    )


def image_neardup_pairs(
    hashed: DataFrame,
    id_col: str = "asset_id",
    hash_col: str = "ahash",
    hash_bits: int = 16,
    n_bands: int = 2,
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-duplicate pairs from perceptual hashes — the
    bucket-then-verify step downstream of :func:`image_ahash`,
    completing the image dedup path the same way the MinHash band
    join completes text dedup: two hashes within ``max_hamming``
    bits differ in at most that many of their ``n_bands`` bit-bands,
    so (for max_hamming < n_bands... strictly, whenever fewer bands
    than differing bits exist, by pigeonhole any pair within the
    radius SHARES at least one exact band) candidates are generated
    by an equi-join on (band index, band value) and only candidates
    pay the exact XOR+bit_count verification — never all pairs.

    Pigeonhole guarantee: with n_bands > max_hamming the recall is
    exact (every true pair shares a band); this operator keeps the
    guarantee by requiring it at call time (loud assert) rather than
    silently under-recalling.

    Output and scale shape — the part that survives 100 TB: images
    collapse to DISTINCT hashes first (rep_id = min image id,
    n_images = cluster size — one map-side-combined aggregation, so
    a million exact-duplicate screenshots become ONE row), the band
    join and verification run at the distinct-hash grain (vocab-
    sized), and the output is one row per NEAR-DUP HASH PAIR:
    (rep_a, rep_b, hamming, n_images_a, n_images_b).  Emitting
    image-id pairs instead would be quadratic in cluster size
    (measured: 2.7M pair rows on 5k synthetic images whose patterns
    repeat — the classic dedup output trap); cluster sizes carry the
    same information linearly, and a keeper policy (keep rep_a,
    drop the n_images_b twins) follows by a join on rep ids."""
    assert n_bands > max_hamming or n_bands >= hash_bits, (
        "image_neardup_pairs: need n_bands > max_hamming for exact "
        "pigeonhole recall"
    )
    band_bits = hash_bits // n_bands
    mask = (1 << band_bits) - 1
    distinct_h = hashed.groupBy(F.col(hash_col).alias("_h")).agg(
        F.min(F.col(id_col)).alias("_rep"),
        F.count("*").alias("_n"),
    )
    bands = distinct_h.select(
        "_h", "_rep", "_n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("_band"),
                    F.shiftright(F.col("_h"), b * band_bits)
                    .bitwiseAND(F.lit(mask)).alias("_val"),
                )
                for b in range(n_bands)
            ])
        ).alias("_bv"),
    ).select("_h", "_rep", "_n", F.col("_bv._band").alias("_band"),
             F.col("_bv._val").alias("_val"))
    left = bands.select(
        F.col("_h").alias("_ha"), F.col("_rep").alias("rep_a"),
        F.col("_n").alias("n_images_a"), "_band", "_val",
    )
    right = bands.select(
        F.col("_h").alias("_hb"), F.col("_rep").alias("rep_b"),
        F.col("_n").alias("n_images_b"), "_band", "_val",
    )
    cands = (
        left.join(right, ["_band", "_val"])
        .filter(F.col("rep_a") < F.col("rep_b"))
        .select("rep_a", "rep_b", "n_images_a", "n_images_b",
                "_ha", "_hb")
        .distinct()
    )
    ham = F.bit_count(
        F.col("_ha").bitwiseXOR(F.col("_hb"))
    )
    return cands.select(
        "rep_a", "rep_b", "n_images_a", "n_images_b",
        ham.cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def audio_fingerprint(
    assets: DataFrame, n_windows: int = 16
) -> DataFrame:
    """Acoustic fingerprint over REAL decoded PCM (stdlib ``wave``
    parse inside Arrow-batched ``mapInPandas``) — the audio twin of
    :func:`image_ahash`: split the sample stream into ``n_windows``
    equal windows, take each window's integer energy Σ|sample|, and
    emit the energy-DELTA sign bits (bit w = E_{w+1} > E_w, wrapping
    at the end) packed MSB-first into an ``n_windows``-bit integer.
    Delta-sign coding is the Chromaprint/Shazam-family trick: it is
    invariant to volume scaling, and all-integer here, so the hash
    is bit-exact across engines and the DuckDB oracle reproduces it
    from the synthetic PCM formula.

    Near-dup pairs then come from :func:`image_neardup_pairs` — the
    band join is hash-generic (any fixed-width integer hash), which
    is the point: ONE bucket-then-verify kernel serves text
    (MinHash), images (aHash), and audio (this)."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for batch in batches:
            out = []
            for p in batch["payload"]:
                with wave.open(io.BytesIO(bytes(p))) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("only 16-bit PCM supported")
                    n = w.getnframes() * w.getnchannels()
                    vals = struct.unpack(f"<{n}h", w.readframes(w.getnframes()))
                win = max(len(vals) // n_windows, 1)
                energies = [
                    sum(abs(v) for v in vals[i * win:(i + 1) * win])
                    for i in range(n_windows)
                ]
                fp = 0
                for i in range(n_windows):
                    nxt = energies[(i + 1) % n_windows]
                    fp = (fp << 1) | (1 if nxt > energies[i] else 0)
                out.append(fp)
            yield pd.DataFrame(
                {"asset_id": batch["asset_id"], "fingerprint": out}
            )

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(_fp, "asset_id long, fingerprint long")
    )


def decode_jpeg_features(payload: bytes) -> list[float]:
    """REAL baseline-JPEG decode (operators/jpegcodec.py: huffman +
    dequantize + IDCT + chroma upsample, stdlib + numpy — no
    PIL/libjpeg) — the fifth real image container and the second
    entropy-coded one, retiring the "compressed codecs stubbed"
    residual for images.  Emits the shared FEATURE_DIM stat layout
    ``[width, height, 255, mean_r, mean_g, mean_b, max_px, min_px]``.

    Progressive/arithmetic/12-bit variants raise
    ``NotImplementedError`` and take :func:`decode_payload`'s
    documented fake fallback, exactly like palette PNG."""
    from eggv_spark.operators.jpegcodec import decode_jpeg

    w, h, (r, g, b) = decode_jpeg(payload)
    return [
        float(w),
        float(h),
        255.0,
        float(r.mean()),
        float(g.mean()),
        float(b.mean()),
        float(max(int(r.max()), int(g.max()), int(b.max()))),
        float(min(int(r.min()), int(g.min()), int(b.min()))),
    ]


def decode_flac_features(payload: bytes) -> list[float]:
    """REAL FLAC decode (operators/flaccodec.py: rice residuals,
    FIXED + LPC predictors, stereo decorrelation, CRC-verified —
    stdlib only, no libFLAC) — the first COMPRESSED audio format
    next to the WAV path, and because FLAC is lossless the feature
    row is bit-identical to the same audio's WAV row by construction.
    Emits decode_wav's FEATURE_DIM stat layout: ``[n_channels,
    sample_rate, sample_width_bits, n_frames, mean, rms, peak,
    zero_crossings]`` (stats over the interleaved sample stream,
    matching decode_wav exactly)."""
    import math

    from eggv_spark.operators.flaccodec import decode_flac

    n_ch, rate, bps, channels = decode_flac(payload)
    n_frames = len(channels[0])
    vals = [channels[c][i] for i in range(n_frames) for c in range(n_ch)]
    n = len(vals) or 1
    mean = sum(vals) / n
    rms = math.sqrt(sum(v * v for v in vals) / n)
    peak = float(max(abs(v) for v in vals)) if vals else 0.0
    zc = sum(1 for a, b in zip(vals, vals[1:]) if (a < 0) != (b < 0))
    return [
        float(n_ch), float(rate), float(bps), float(n_frames),
        mean, rms, peak, float(zc),
    ]
