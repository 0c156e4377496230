"""FLAC codec (lossless audio), stdlib only — no libFLAC/librosa.

The audio counterpart of ``jpegcodec.py`` for retiring the
"compressed codecs stubbed" residual: WAV was the only real audio
path; this adds the dominant LOSSLESS compressed format, decoded
bit-exactly (FLAC is lossless, so round trips are equality checks,
not PSNR bounds — a stronger test than the image side can have).

Scope:

* DECODE: full subframe coverage — CONSTANT, VERBATIM, FIXED
  (orders 0-4), and LPC (any order; decode-side LPC is just the
  quantized FIR the stream carries) — rice residuals in both 4- and
  5-bit parameter widths with escape partitions, wasted-bits,
  independent / left-side / right-side / mid-side stereo, UTF-8
  frame numbers, CRC-8 (header) and CRC-16 (frame) VERIFIED.
  16-bit PCM (the WAV path's same contract); other depths raise
  ``NotImplementedError`` loudly.
* ENCODE (:func:`encode_flac`): fixture generator — FIXED predictors
  (best of orders 0-2 per frame), single rice partition, independent
  channels, constant block size.  Spec-conformant output; exists so
  the decoder is round-trip testable where no FLAC writer ships.

Like the JPEG module: per-payload CPU work inside the existing Arrow
``mapInPandas`` plumbing; a 100 TB decode farm would swap in libFLAC
behind the identical function signature.
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------------------
# CRCs (FLAC polynomials)
# --------------------------------------------------------------------------

def _crc8(data: bytes) -> int:  # x^8 + x^2 + x + 1
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:  # x^16 + x^15 + x^2 + 1
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# --------------------------------------------------------------------------
# Bit I/O
# --------------------------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.byte = pos
        self.bit = 0

    def tell_byte(self) -> int:
        return self.byte

    def aligned(self) -> bool:
        return self.bit == 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.buf):
                raise ValueError("flac: truncated stream")
            v = (v << 1) | ((self.buf[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)


# --------------------------------------------------------------------------
# Shared pieces
# --------------------------------------------------------------------------

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_BLOCKSIZE_CODE = {  # code -> size (None = read from header)
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLESIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _utf8_number(n: int) -> bytes:
    """FLAC's extended-UTF8 coding of the frame number (1-7 bytes)."""
    if n < 0x80:
        return bytes([n])
    # n_follow continuation bytes leave 6-n_follow ... per UTF-8:
    # 2 bytes hold 11 payload bits, 3 hold 16, then +5 per extra byte
    for n_follow, limit_bits in ((1, 11), (2, 16), (3, 21), (4, 26),
                                 (5, 31), (6, 36)):
        if n < (1 << limit_bits):
            break
    else:
        raise ValueError("flac: frame number too large")
    tail = []
    for _ in range(n_follow):
        tail.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_prefix = (0xFF << (7 - n_follow)) & 0xFF
    return bytes([lead_prefix | n]) + bytes(reversed(tail))


def _read_utf8_number(r: _Reader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_follow):
        b = r.read(8)
        if b >> 6 != 0b10:
            raise ValueError("flac: bad UTF-8 frame number")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _zigzag_encode(s: int) -> int:
    return (s << 1) ^ (s >> 63) if s < 0 else s << 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_flac(payload: bytes) -> tuple[int, int, int, list[list[int]]]:
    """Decode a FLAC stream to (n_channels, sample_rate, bits,
    [per-channel sample lists]).  CRC-8/CRC-16 verified per frame;
    corrupt data raises ``ValueError``, unsupported variants raise
    ``NotImplementedError`` — never a silent garbage waveform."""
    if payload[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        hdr = payload[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            r = _Reader(body)
            r.read(16); r.read(16); r.read(24); r.read(24)
            rate = r.read(20)
            n_ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            streaminfo = (rate, n_ch, bps, total)
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: no STREAMINFO")
    rate, n_ch, bps, total = streaminfo
    if bps != 16:
        raise NotImplementedError(f"flac: {bps}-bit depth not supported")
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        pos, block = _decode_frame(payload, pos, n_ch, bps)
        for c in range(n_ch):
            channels[c].extend(block[c])
        got += len(block[0])
    if total and got < total:
        raise ValueError("flac: stream ended early")
    if total:
        channels = [ch[:total] for ch in channels]
    return n_ch, rate, bps, channels


def _decode_frame(payload, pos, n_ch, bps):
    hdr_start = pos
    r = _Reader(payload, pos)
    sync = r.read(14)
    if sync != 0b11111111111110:
        raise ValueError("flac: lost frame sync")
    r.read(1)  # reserved
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_asgn = r.read(4)
    ss_code = r.read(3)
    r.read(1)  # reserved
    _read_utf8_number(r)
    if bs_code == 0:
        raise ValueError("flac: reserved block size code")
    if bs_code == 6:
        blocksize = r.read(8) + 1
    elif bs_code == 7:
        blocksize = r.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODE[bs_code]
    if sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    if ss_code == 0:
        frame_bps = bps
    elif ss_code in _SAMPLESIZE_CODE:
        frame_bps = _SAMPLESIZE_CODE[ss_code]
    else:
        raise ValueError("flac: reserved sample size code")
    if not r.aligned():
        raise ValueError("flac: misaligned frame header")
    crc8_stored = r.read(8)
    if _crc8(payload[hdr_start:r.tell_byte() - 1]) != crc8_stored:
        raise ValueError("flac: frame header CRC-8 mismatch")

    if ch_asgn < 8:
        if ch_asgn + 1 != n_ch:
            raise ValueError("flac: channel count mismatch")
        plan = [("plain", frame_bps)] * n_ch
    elif ch_asgn in (8, 9, 10):
        if n_ch != 2:
            raise ValueError("flac: stereo decorrelation needs 2 channels")
        # the SIDE channel carries one extra bit
        if ch_asgn == 8:
            plan = [("plain", frame_bps), ("side", frame_bps + 1)]
        elif ch_asgn == 9:
            plan = [("side", frame_bps + 1), ("plain", frame_bps)]
        else:
            plan = [("plain", frame_bps), ("side", frame_bps + 1)]
    else:
        raise ValueError("flac: reserved channel assignment")

    subs = []
    for _role, sub_bps in plan:
        subs.append(_decode_subframe(r, blocksize, sub_bps))
    # zero-pad to byte alignment, then CRC-16 over the whole frame
    while not r.aligned():
        if r.read(1):
            raise ValueError("flac: nonzero frame padding")
    crc16_stored = r.read(16)
    if _crc16(payload[hdr_start:r.tell_byte() - 2]) != crc16_stored:
        raise ValueError("flac: frame CRC-16 mismatch")

    if ch_asgn < 8:
        block = subs
    elif ch_asgn == 8:  # left/side: side = left - right
        left = subs[0]
        block = [left, [l - s for l, s in zip(left, subs[1])]]
    elif ch_asgn == 9:  # right/side
        right = subs[1]
        block = [[rr + s for rr, s in zip(right, subs[0])], right]
    else:  # mid/side
        block = [[], []]
        for m, s in zip(subs[0], subs[1]):
            m = (m << 1) | (s & 1)
            block[0].append((m + s) >> 1)
            block[1].append((m - s) >> 1)
    return r.tell_byte(), block


def _decode_subframe(r: _Reader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("flac: subframe pad bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        v = r.read_signed(bps)
        out = [v] * blocksize
    elif t == 1:  # VERBATIM
        out = [r.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        out = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        coef = _FIXED_COEF[order]
        for e in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append(e + pred)
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        out = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4)
        if prec == 0b1111:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coef = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        for e in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef)) >> shift
            out.append(e + pred)
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(r: _Reader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    n_part = 1 << po
    if blocksize % n_part:
        raise ValueError("flac: partition order does not divide block size")
    out = []
    for p in range(n_part):
        n = blocksize // n_part - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << k) | r.read(k)
                out.append(_zigzag_decode(u))
    return out


# --------------------------------------------------------------------------
# Encoder (fixture generator): FIXED predictors, one rice partition
# --------------------------------------------------------------------------

def _best_fixed(samples: list[int]) -> tuple[int, list[int]]:
    best = None
    for order in (0, 1, 2):
        if len(samples) <= order:
            continue
        coef = _FIXED_COEF[order]
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            for i in range(order, len(samples))
        ]
        cost = sum(abs(x) for x in resid)
        if best is None or cost < best[2]:
            best = (order, resid, cost)
    return best[0], best[1]


def _rice_k(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(x) for x in resid) / len(resid) + 1
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def encode_flac(
    channels: list[list[int]],
    sample_rate: int = 8000,
    block_size: int = 1024,
) -> bytes:
    """Encode 16-bit PCM channels as a FLAC stream (FIXED predictors,
    independent channels, single rice partition per subframe)."""
    n_ch = len(channels)
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise ValueError("encode_flac: channel length mismatch")
    out = bytearray(b"fLaC")
    si = _Writer()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(15, 5)  # bps-1 = 15
    si.write(total, 36)
    si.align()
    body = bytes(si.out) + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frame_no = 0
    for start in range(0, total, block_size):
        n = min(block_size, total - start)
        hdr = _Writer()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(7, 4)  # blocksize: 16-bit field follows
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(n_ch - 1, 4)  # independent channels
        hdr.write(4, 3)  # 16-bit
        hdr.write(0, 1)
        hdr.align()
        head = bytes(hdr.out) + _utf8_number(frame_no) + struct.pack(">H", n - 1)
        head += bytes([_crc8(head)])
        bw = _Writer()
        for ch in channels:
            seg = ch[start:start + n]
            order, resid = _best_fixed(seg)
            bw.write(0, 1)
            bw.write(8 + order, 6)
            bw.write(0, 1)  # no wasted bits
            for s in seg[:order]:
                bw.write(s & 0xFFFF, 16)
            bw.write(0, 2)  # rice, 4-bit params
            bw.write(0, 4)  # partition order 0
            k = _rice_k(resid)
            bw.write(k, 4)
            for e in resid:
                u = _zigzag_encode(e)
                bw.write_unary(u >> k)
                if k:
                    bw.write(u & ((1 << k) - 1), k)
        bw.align()
        frame = head + bytes(bw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
