"""FLAC codec (operators/flaccodec.py): LOSSLESS round trips (exact
equality — stronger than the image side's PSNR bounds), CRC
verification, stereo decorrelation modes, LPC subframes, and the
decode_payload integration extending the compressed-codec coverage
to audio.
"""

from __future__ import annotations

import math
import struct

import pytest

from eggv_spark.operators.flaccodec import (
    _crc8,
    _crc16,
    _Reader,
    _read_utf8_number,
    _utf8_number,
    _Writer,
    _zigzag_encode,
    decode_flac,
    encode_flac,
)
from eggv_spark.operators.multimodal import decode_flac_features, decode_payload


def _sig(n, f=7.0, amp=12000, noise=True):
    return [
        int(amp * math.sin(i / f)) + ((i * 37 % 101) - 50 if noise else 0)
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def test_utf8_frame_numbers_roundtrip():
    for n in (0, 1, 127, 128, 2047, 2048, 65535, 65536, 1 << 20,
              (1 << 31) + 5, (1 << 36) - 1):
        assert _read_utf8_number(_Reader(_utf8_number(n))) == n


def test_crc_vectors():
    # standard check values: CRC-8/SMBUS (poly 0x07) = 0xF4;
    # FLAC's CRC-16 is the UNREFLECTED 0x8005 (CRC-16/UMTS aka
    # BUYPASS, check 0xFEE8) - NOT the reflected ARC variant (0xBB3D)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


# ---------------------------------------------------------------------------
# lossless round trips (the whole point of FLAC)
# ---------------------------------------------------------------------------


def test_mono_roundtrip_is_bit_exact_and_smaller():
    sig = _sig(5000)
    buf = encode_flac([sig], sample_rate=8000, block_size=1024)
    n_ch, rate, bps, chans = decode_flac(buf)
    assert (n_ch, rate, bps) == (1, 8000, 16)
    assert chans[0] == sig
    assert len(buf) < 2 * len(sig)  # actually compresses


def test_stereo_roundtrip_bit_exact():
    left = _sig(3000)
    right = _sig(3000, f=11.0, amp=9000, noise=False)
    buf = encode_flac([left, right], sample_rate=16000, block_size=512)
    n_ch, rate, _, chans = decode_flac(buf)
    assert (n_ch, rate) == (2, 16000)
    assert chans[0] == left and chans[1] == right


def test_edge_signals():
    # constant, full-scale, alternating, and a non-multiple-of-block tail
    for sig in (
        [100] * 300,
        [32767, -32768] * 150,
        list(range(-500, 500)),
        _sig(1025),  # one sample past a block boundary
    ):
        buf = encode_flac([sig], block_size=256)
        assert decode_flac(buf)[3][0] == sig


# ---------------------------------------------------------------------------
# CRC verification catches corruption
# ---------------------------------------------------------------------------


def test_corrupted_frame_fails_crc():
    buf = bytearray(encode_flac([_sig(2000)], block_size=512))
    # flip one bit deep inside the entropy data of the first frame
    buf[len(buf) // 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(buf))


def test_truncated_stream_raises():
    buf = encode_flac([_sig(2000)], block_size=512)
    with pytest.raises(ValueError):
        decode_flac(buf[: len(buf) - 30])
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"NOPE" + buf[4:])


# ---------------------------------------------------------------------------
# decoder paths the fixture encoder does not emit: hand-crafted
# frames with stereo decorrelation and LPC subframes
# ---------------------------------------------------------------------------


def _handcraft_stream(ch_asgn, sub_payloads, n, rate=8000, n_ch=2,
                      sub_writer=None):
    """Assemble a 1-frame FLAC stream with explicit channel assignment;
    each entry of sub_payloads is (samples, bps) written VERBATIM
    unless sub_writer overrides."""
    out = bytearray(b"fLaC")
    si = _Writer()
    si.write(n, 16); si.write(n, 16); si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(n_ch - 1, 3); si.write(15, 5)
    si.write(n, 36)
    si.align()
    body = bytes(si.out) + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    hdr = _Writer()
    hdr.write(0b11111111111110, 14); hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(7, 4); hdr.write(0, 4); hdr.write(ch_asgn, 4)
    hdr.write(4, 3); hdr.write(0, 1)
    hdr.align()
    head = bytes(hdr.out) + _utf8_number(0) + struct.pack(">H", n - 1)
    head += bytes([_crc8(head)])
    bw = _Writer()
    for samples, bps in sub_payloads:
        if sub_writer:
            sub_writer(bw, samples, bps)
        else:
            bw.write(0, 1)
            bw.write(1, 6)  # VERBATIM
            bw.write(0, 1)
            for s in samples:
                bw.write(s & ((1 << bps) - 1), bps)
    bw.align()
    frame = head + bytes(bw.out)
    frame += struct.pack(">H", _crc16(frame))
    return bytes(out + frame)


def test_left_side_and_right_side_and_mid_side_decode():
    left = [100, -200, 300, -400, 500, -600, 700, -800]
    right = [90, -150, 250, -350, 450, -550, 650, -750]
    n = len(left)
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    # ch_asgn 8: left/side
    buf = _handcraft_stream(8, [(left, 16), (side, 17)], n)
    assert decode_flac(buf)[3] == [left, right]
    # ch_asgn 9: right/side (side first, one extra bit)
    buf = _handcraft_stream(9, [(side, 17), (right, 16)], n)
    assert decode_flac(buf)[3] == [left, right]
    # ch_asgn 10: mid/side
    buf = _handcraft_stream(10, [(mid, 16), (side, 17)], n)
    assert decode_flac(buf)[3] == [left, right]


def test_lpc_subframe_decodes():
    # signal following s[i] = (3*s[i-1] - s[i-2]) >> 1 + residual
    coef, shift, order = [3, -1], 1, 2
    samples = [100, 120]
    resid = [5, -3, 7, 0, -2, 4, -6, 1, 3, -5, 2, 0, -1, 6]
    for e in resid:
        pred = (coef[0] * samples[-1] + coef[1] * samples[-2]) >> shift
        samples.append(e + pred)
    n = len(samples)

    def lpc_writer(bw, s, bps):
        bw.write(0, 1)
        bw.write(32 | (order - 1), 6)  # LPC, order 2
        bw.write(0, 1)  # no wasted bits
        for w in s[:order]:
            bw.write(w & 0xFFFF, 16)
        bw.write(4 - 1, 4)  # precision 4 bits
        bw.write(shift, 5)
        for c in coef:
            bw.write(c & 0xF, 4)
        bw.write(0, 2)  # rice 4-bit
        bw.write(0, 4)  # partition order 0
        bw.write(3, 4)  # rice k=3
        for e in resid:
            u = _zigzag_encode(e)
            bw.write_unary(u >> 3)
            bw.write(u & 7, 3)

    buf = _handcraft_stream(
        0, [(samples, 16)], n, n_ch=1, sub_writer=lpc_writer
    )
    assert decode_flac(buf)[3][0] == samples


# ---------------------------------------------------------------------------
# decode_payload integration + WAV parity
# ---------------------------------------------------------------------------


def test_decode_payload_routes_flac_and_matches_wav():
    import io
    import wave

    sig = _sig(2000, amp=8000)
    flac = encode_flac([sig], sample_rate=8000, block_size=512)
    feats = decode_payload(flac, "audio", fake=False)
    assert feats == decode_flac_features(flac)
    # the same samples through the WAV path give the identical row
    # (FLAC is lossless - this is the cross-container invariant)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(sig)}h", *sig))
    wav_feats = decode_payload(bio.getvalue(), "audio", fake=False)
    assert feats == wav_feats
