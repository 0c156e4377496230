"""GIF codec: real variable-width LZW decode + Column-expr synthesis.

The decoder must interoperate with REAL GIF writers, so these tests
include a faithful compressing LZW encoder (giflib's width-bump
discipline: the encoder checks its next-free counter after writing
each code; the decoder counts codes read — one prospective slot per
code — and bumps past 2**width) and require bit-exact round-trips
through dictionary growth, multiple width bumps, and the KwKwK case.
"""

from __future__ import annotations

import random
import struct

import pytest

from eggv_spark.operators.multimodal import (
    _gif_color_table,
    _gif_parse,
    _lzw_decode,
    decode_gif,
    decode_payload,
    extract_features,
    synthesize_gif_images,
)


def lzw_encode(indices, min_code):
    """Real GIF LZW compressor (test-side reference): greedy longest
    match, CLEAR preamble, EOI terminator, LSB-first variable-width
    packing with the giflib bump rule (after writing a code at the
    current width, bump if the next free code reached 2**width)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    state = {"width": min_code + 1, "free": eoi + 1}
    bits: list[int] = []

    def out(code):
        for b in range(state["width"]):
            bits.append((code >> b) & 1)
        if state["free"] >= (1 << state["width"]) and state["width"] < 12:
            state["width"] += 1

    table = {(i,): i for i in range(clear)}
    out(clear)
    prev: tuple[int, ...] = ()
    for s in indices:
        cur = prev + (s,)
        if cur in table:
            prev = cur
            continue
        out(table[prev])
        table[cur] = state["free"]
        state["free"] += 1
        prev = (s,)
    if prev:
        out(table[prev])
    out(eoi)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)
    return bytes(data)


def make_gif(
    width,
    height,
    indices,
    n_colors,
    min_code,
    *,
    version=b"GIF87a",
    extensions=b"",
    local_table=False,
    interlace=False,
):
    """Assemble a complete GIF around a REAL-compressed LZW stream,
    splitting the data into 255-byte sub-blocks like any writer."""
    size_bits = max(n_colors.bit_length() - 1, 1)  # 2**(s+1) entries
    table = _gif_color_table(n_colors)
    lsd_packed = (0x80 | (size_bits - 1)) if not local_table else 0x00
    out = bytearray(version)
    out += struct.pack("<HH", width, height) + bytes((lsd_packed, 0, 0))
    if not local_table:
        out += table
    out += extensions
    ipacked = (0x80 | (size_bits - 1)) if local_table else 0x00
    if interlace:
        ipacked |= 0x40
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes((ipacked,))
    if local_table:
        out += table
    data = lzw_encode(indices, min_code)
    out += bytes((min_code,))
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_lzw_roundtrip_real_compression():
    """Bit-exact round-trip through a genuinely compressing stream:
    1000 random 4-color pixels force the code width from 3 up past 9
    and exercise both dictionary-hit and KwKwK paths."""
    rng = random.Random(7)
    seq = [rng.randrange(4) for _ in range(1000)]
    data = lzw_encode(seq, 2)
    assert len(data) < 1000  # it actually compressed
    assert _lzw_decode(data, 2, 1000) == seq

    # KwKwK: a constant run's second code references the entry being
    # defined by that very code
    run = [1] * 50
    assert _lzw_decode(lzw_encode(run, 2), 2, 50) == run

    # repetitive text-like data compresses deeply (long dict entries)
    pat = ([0, 1, 2, 3] * 40 + [3, 2, 1, 0] * 40) * 3
    assert _lzw_decode(lzw_encode(pat, 2), 2, len(pat)) == pat

    with pytest.raises(ValueError):
        _lzw_decode(lzw_encode(seq, 2)[:-2], 2, 1000)  # EOI cut off
    with pytest.raises(ValueError):
        _lzw_decode(bytes((0b11111100,)) * 4, 2, 10)  # code beyond table


def test_gif_parse_real_file_shapes():
    """Full-file parse: GIF89a with extension blocks, multi-sub-block
    data, global vs local color tables, and the documented error and
    NotImplementedError branches."""
    rng = random.Random(11)
    w, h = 37, 23  # odd sizes, data spans several 255-byte sub-blocks
    idx = [rng.randrange(4) for _ in range(w * h)]
    table = _gif_color_table(4)
    expected = [
        b"".join(
            table[3 * c : 3 * c + 3] for c in idx[r * w : (r + 1) * w]
        )
        for r in range(h)
    ]

    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    comment = b"\x21\xfe\x05hello\x00"
    gif = make_gif(w, h, idx, 4, 2, version=b"GIF89a",
                   extensions=gce + comment)
    assert _gif_parse(gif) == (w, h, expected)

    # local color table overrides an absent global one
    local = make_gif(w, h, idx, 4, 2, local_table=True)
    assert _gif_parse(local) == (w, h, expected)

    with pytest.raises(ValueError):
        _gif_parse(b"NOTGIF" + gif[6:])
    with pytest.raises(ValueError):
        _gif_parse(gif[:40])  # truncated mid-color-table/descriptor
    with pytest.raises(ValueError):
        _gif_parse(gif[:13] + table + b"\x3b")  # no image data
    with pytest.raises(NotImplementedError):
        _gif_parse(make_gif(w, h, idx, 4, 2, interlace=True))
    # truncated data sub-block
    with pytest.raises(ValueError):
        _gif_parse(gif[:-10])
    # raster/stream length mismatch
    with pytest.raises(ValueError):
        _gif_parse(make_gif(w, h + 1, idx, 4, 2))


def test_decode_gif_stats_and_dispatch():
    rng = random.Random(3)
    w, h = 6, 5
    idx = [rng.randrange(8) for _ in range(w * h)]
    gif = make_gif(w, h, idx, 8, 3)
    table = _gif_color_table(8)
    rgb = [table[3 * c : 3 * c + 3] for c in idx]
    feats = decode_gif(gif)
    assert feats[:3] == [6.0, 5.0, 255.0]
    n = w * h
    for c in range(3):
        assert abs(feats[3 + c] - sum(px[c] for px in rgb) / n) < 1e-9
    assert feats[6] == max(max(px) for px in rgb)
    assert feats[7] == min(min(px) for px in rgb)
    # signature dispatch, both versions
    assert decode_payload(gif, "image", fake=False) == feats
    assert decode_payload(b"GIF89a" + gif[6:], "image", fake=False) == feats


def test_synthesized_gif_decodes_for_real(spark):
    """Column-expression GIF synthesis (byte-aligned LZW root codes
    with periodic CLEAR) round-trips through the real variable-width
    decoder: stats match the generative formula with no
    special-casing."""
    docs = spark.createDataFrame(
        [(3, "t", "s", "en"), (7, "u", "s", "en")],
        ["doc_id", "text", "source", "lang"],
    )
    assets = synthesize_gif_images(docs)  # 6x4 default
    w, h, n = 6, 4, 24
    table = _gif_color_table(128)
    for r in assets.collect():
        d = r["asset_id"]
        got_w, got_h, rows = _gif_parse(bytes(r["payload"]))
        assert (got_w, got_h) == (w, h)
        exp_idx = [(d * 13 + i * 29) % 128 for i in range(n)]
        exp_rows = [
            b"".join(
                table[3 * c : 3 * c + 3]
                for c in exp_idx[rr * w : (rr + 1) * w]
            )
            for rr in range(h)
        ]
        assert rows == exp_rows
        feats = decode_gif(bytes(r["payload"]))
        for c in range(3):
            exp = sum(sum(er[c::3]) for er in exp_rows) / n
            assert abs(feats[3 + c] - exp) < 1e-9

    # and through the Arrow-batched mapInPandas plumbing
    out = extract_features(assets, fake_decode=False).collect()
    assert len(out) == 2 and all(row.feature[0] == 6.0 for row in out)


def test_synthesized_gif_survives_many_pixels(spark):
    """A 14x14 raster (196 pixels) crosses the 100-pixel CLEAR
    boundary twice — the degenerate stream stays one byte per code
    and the width never grows."""
    docs = spark.createDataFrame([(5, "t", "s", "en")],
                                 ["doc_id", "text", "source", "lang"])
    row = synthesize_gif_images(docs, width=14, height=14).collect()[0]
    got_w, got_h, rows = _gif_parse(bytes(row["payload"]))
    assert (got_w, got_h) == (14, 14)
    table = _gif_color_table(128)
    flat = b"".join(rows)
    for i in (0, 99, 100, 195):
        c = (5 * 13 + i * 29) % 128
        assert flat[3 * i : 3 * i + 3] == table[3 * c : 3 * c + 3]
    with pytest.raises(ValueError):
        synthesize_gif_images(docs, width=16, height=16)  # > one sub-block


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    min_code=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n=st.integers(min_value=0, max_value=2000),
    structure=st.sampled_from(["random", "runs", "cycle"]),
)
def test_lzw_roundtrip_property(min_code, seed, n, structure):
    """Property: encode->decode is the identity for ANY pixel stream
    over any GIF-legal root alphabet, across all the width-bump and
    dictionary regimes the generators can reach (random data barely
    compresses; runs hit KwKwK; short cycles grow the deepest
    dictionary entries)."""
    rng = random.Random(seed)
    roots = 1 << min_code
    if structure == "random":
        seq = [rng.randrange(roots) for _ in range(n)]
    elif structure == "runs":
        seq = []
        while len(seq) < n:
            seq.extend([rng.randrange(roots)] * rng.randint(1, 40))
        seq = seq[:n]
    else:
        period = rng.randint(1, 8)
        cyc = [rng.randrange(roots) for _ in range(period)]
        seq = [cyc[i % period] for i in range(n)]
    assert _lzw_decode(lzw_encode(seq, min_code), min_code, n) == seq


def test_png_decompression_bomb_rejected():
    """Review fix: a small payload whose IDAT inflates far past the
    declared raster must be rejected by the BOUNDED inflate (cap =
    raster+1), not materialized before the length check."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    # declares 4x5 RGB but the stream inflates to 10 MB
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000, 9))
        + chunk(b"IEND", b"")
    )
    assert len(bomb) < 50_000  # it really is a small payload
    from eggv_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError):
        decode_png(bomb)

    # short IHDR raises ValueError, not struct.error
    short = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", b"\x00\x00\x00\x04")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(short)


def test_unsupported_variants_keep_fake_fallback():
    """Review fix: signature-dispatched payloads whose VARIANT the
    stdlib parsers decline (interlaced GIF/PNG) fall back to the
    documented fake=True stand-in instead of crashing the task;
    fake=False still raises, and corrupt payloads raise either way."""
    import struct
    import zlib

    from eggv_spark.operators.multimodal import FEATURE_DIM, decode_payload

    rng = random.Random(5)
    idx = [rng.randrange(4) for _ in range(12)]
    interlaced_gif = make_gif(4, 3, idx, 4, 2, interlace=True)
    with pytest.raises(NotImplementedError):
        decode_payload(interlaced_gif, "image", fake=False)
    vec = decode_payload(interlaced_gif, "image", fake=True)
    assert len(vec) == FEATURE_DIM and all(0.0 <= v <= 1.0 for v in vec)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    interlaced_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_payload(interlaced_png, "image", fake=False)
    assert len(decode_payload(interlaced_png, "image", fake=True)) == FEATURE_DIM

    # corruption is NOT papered over by fake=True
    truncated = make_gif(4, 3, idx, 4, 2)[:-6]
    with pytest.raises(ValueError):
        decode_payload(truncated, "image", fake=True)
