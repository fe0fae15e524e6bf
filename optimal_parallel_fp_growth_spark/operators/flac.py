"""REAL FLAC encode/decode (round 9) — the table-free compressed-audio
PCM path.

The MP3/AAC sample-decode seam is TABLE-bound (see operators/
multimodal.py module docstring): every MPEG-audio PCM path needs
normative spec tables this container cannot source. FLAC (RFC 9639 —
the codec speech/audio ML corpora actually ship in) has NO normative
tables: rice/golomb codes, fixed and LPC predictors, CRC-8/16
polynomials, and the UTF-8-style frame numbering are all closed-form,
so a bit-honest pure-python decoder and a REAL encoder builder twin are
implementable from the public spec structure alone. Lossless means the
compressed round trip is EXACT, which is precisely what a closed-form
SQL oracle needs.

Decoder coverage: STREAMINFO + metadata-block walk, fixed/variable
blocking, all block-size codes, sample-rate codes (streaminfo +
explicit 8/16-bit forms), all four channel assignments (independent,
left/side, right/side, mid/side), CONSTANT / VERBATIM / FIXED 0-4 /
LPC 1-32 subframes, wasted bits, both rice methods incl. the escape
partitions, partition orders 0-15, and CRC-8 / CRC-16 / PCM-MD5
verification (any mismatch raises — fail-closed like every decoder in
multimodal.py). Encoder (builder twin): 4-24 bit PCM, mono/stereo,
CONSTANT detection, best-of fixed orders 0-4 with exact-cost rice
params (escape when raw is cheaper), VERBATIM fallback, and the three
stereo decorrelations.

No reference counterpart (the reference is a frequent-pattern-mining
engine: epfp/FPGrowth.scala); this extends SURVEY §7.2 M8's multimodal
family.
"""

from __future__ import annotations

import functools
import hashlib
import struct

__all__ = [
    "build_flac_samples",
    "decode_flac_samples",
    "flac_decode_pcm",
]


# ---------------------------------------------------------------------
# CRCs (closed-form polynomials; init 0, no reflection, no final xor)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------------
# bit IO


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self.out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits:
            if self.bytepos >= len(self.data):
                raise NotImplementedError("truncated FLAC bitstream")
            avail = 8 - self.bitpos
            take = min(avail, nbits)
            cur = self.data[self.bytepos]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            nbits -= take
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            if self.read(8 - self.bitpos):
                raise NotImplementedError("non-zero FLAC frame padding")


# ---------------------------------------------------------------------
# shared closed forms

_FIXED_COEFS = {  # prediction = sum(coef[j] * s[i-1-j])
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

# block-size code -> samples (None = coded explicitly / reserved)
# Absolute ceiling on total decoded samples (all channels interleaved).
# CONSTANT subframes expand ~20 payload bytes to 65536 samples/frame, so
# no payload-relative bound exists; 2^23 samples ≈ 95 s of stereo 44.1k,
# far above any synthesized test stream, and bounds worst-case decode
# memory to ~0.25 GB of Python ints.
_MAX_DECODED_SAMPLES = 1 << 23

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes((n,))
    # capacity of a k-byte sequence: (7-k) + 6*(k-1) payload bits
    nbytes = 2
    while n >= (1 << ((7 - nbytes) + 6 * (nbytes - 1))):
        nbytes += 1
        if nbytes > 7:
            raise ValueError("FLAC coded number exceeds 36 bits")
    lead_bits = 7 - nbytes
    cont = [(n >> (6 * i)) & 0x3F for i in range(nbytes - 1)]
    lead = ((0xFF << (lead_bits + 1)) & 0xFF) | (n >> (6 * (nbytes - 1)))
    return bytes([lead] + [0x80 | c for c in reversed(cont)])


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise NotImplementedError("invalid FLAC coded number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise NotImplementedError("invalid FLAC coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def _pcm_md5(samples: list[int], channels: int, bps: int) -> bytes:
    """MD5 of the unencoded PCM exactly as STREAMINFO defines it:
    interleaved, little-endian, ceil(bps/8) bytes per sample, signed."""
    width = (bps + 7) // 8
    h = hashlib.md5()
    h.update(
        b"".join(
            (s & ((1 << (8 * width)) - 1)).to_bytes(width, "little")
            for s in samples
        )
    )
    return h.digest()


# ---------------------------------------------------------------------
# encoder (builder twin)


def _best_rice_param(residual: list[int], maxparam: int) -> tuple[int, int]:
    """(param, total bits) minimizing the exact rice cost; param ==
    maxparam+1 signals the raw escape is cheaper."""
    zz = [_zigzag(r) for r in residual]
    best = (None, None)
    for p in range(maxparam + 1):
        bits = sum((z >> p) + 1 + p for z in zz)
        if best[1] is None or bits < best[1]:
            best = (p, bits)
        if best[1] <= len(zz) * (p + 1):
            break  # larger params only add fixed cost from here
    rawbits = max((abs(r).bit_length() + 1 for r in residual), default=1)
    rawcost = 5 + rawbits * len(residual)
    if rawcost < best[1]:
        return maxparam + 1, rawcost
    return best


def _encode_subframe(bw: _BitWriter, chan: list[int], bps: int) -> None:
    n = len(chan)
    if all(s == chan[0] for s in chan):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(chan[0], bps)
        return
    # best fixed order by exact coded size
    best = None  # (bits, order, residual, param)
    for order, coefs in _FIXED_COEFS.items():
        if order >= n:
            break
        res = [
            chan[i] - sum(c * chan[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        param, rbits = _best_rice_param(res, 14)
        total = order * bps + 2 + 4 + (4 if param <= 14 else 4) + rbits
        if best is None or total < best[0]:
            best = (total, order, res, param)
    verbatim_bits = n * bps
    if best is None or best[0] >= verbatim_bits:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for s in chan:
            bw.write(s, bps)
        return
    _, order, res, param = best
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED, order 0-4
    bw.write(0, 1)  # no wasted bits
    for s in chan[:order]:
        bw.write(s, bps)
    bw.write(0, 2)  # residual method 0 (4-bit rice)
    bw.write(0, 4)  # partition order 0
    if param <= 14:
        bw.write(param, 4)
        for r in res:
            z = _zigzag(r)
            bw.write_unary(z >> param)
            bw.write(z, param)
    else:
        bw.write(15, 4)  # escape
        rawbits = max((abs(r).bit_length() + 1 for r in res), default=1)
        bw.write(rawbits, 5)
        for r in res:
            bw.write(r, rawbits)


def build_flac_samples(
    samples: list[int],
    sample_rate: int,
    channels: int = 1,
    bps: int = 16,
    block_size: int = 192,
    stereo_mode: str = "independent",
) -> bytes:
    """REAL FLAC encoder over a flat interleaved sample list (the
    builder twin of :func:`decode_flac_samples`): fixed-blocking
    frames, CONSTANT / best-fixed-order / VERBATIM subframes with
    exact-cost rice coding, optional left/right/mid-side stereo
    decorrelation, CRC-8/CRC-16 footers, and the STREAMINFO PCM MD5."""
    if channels not in (1, 2):
        raise ValueError("channels must be 1 or 2")
    if not 4 <= bps <= 24:
        raise ValueError("bps out of the supported 4-24 range")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    if stereo_mode not in ("independent", "left_side", "right_side", "mid_side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if not samples:
        raise ValueError("no samples")
    if not 1 <= sample_rate <= 65535:
        raise ValueError("sample_rate must fit the 16-bit header form")
    if not 1 <= block_size <= 65536:
        raise ValueError("block_size out of range")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if any(not lo <= s <= hi for s in samples):
        raise ValueError(f"sample out of {bps}-bit range")
    n_frames_pcm = len(samples) // channels
    chans = [samples[c::channels] for c in range(channels)]

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_frames_pcm, 36)
    body = bytes(si.out) + _pcm_md5(samples, channels, bps)
    out += bytes((0x80, 0, 0, len(body))) + body  # last-block STREAMINFO

    frame_no = 0
    pos = 0
    while pos < n_frames_pcm:
        nblk = min(block_size, n_frames_pcm - pos)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        if nblk == block_size and block_size in _BLOCK_SIZES.values():
            code = next(k for k, v in _BLOCK_SIZES.items() if v == block_size)
        elif nblk <= 256:
            code = 6
        else:
            code = 7
        bw.write(code, 4)
        bw.write(0b1101, 4)  # sample rate: 16-bit Hz follows
        if channels == 1:
            assign = 0
        else:
            assign = {"independent": 1, "left_side": 8,
                      "right_side": 9, "mid_side": 10}[stereo_mode]
        bw.write(assign, 4)
        # sample-size code when bps has one, else 0 = from STREAMINFO
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(bps, 0), 3)
        bw.write(0, 1)
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        if code == 6:
            bw.write(nblk - 1, 8)
        elif code == 7:
            bw.write(nblk - 1, 16)
        bw.write(sample_rate, 16)
        bw.align()
        header = bytes(bw.out)
        bw.write(_crc8(header), 8)

        blk = [ch[pos : pos + nblk] for ch in chans]
        if channels == 2 and stereo_mode != "independent":
            l, r = blk
            side = [a - b for a, b in zip(l, r)]
            if stereo_mode == "left_side":
                subs = [(l, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bps + 1), (r, bps)]
            else:
                mid = [(a + b) >> 1 for a, b in zip(l, r)]
                subs = [(mid, bps), (side, bps + 1)]
        else:
            subs = [(ch, bps) for ch in blk]
        for chan, cbps in subs:
            _encode_subframe(bw, chan, cbps)
        bw.align()
        frame = bytes(bw.out)
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_no += 1
        pos += nblk
    return bytes(out)


# ---------------------------------------------------------------------
# decoder


def _decode_residual(br: _BitReader, nblk: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise NotImplementedError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    if nblk % (1 << po):
        raise NotImplementedError("FLAC partition order does not divide block")
    res: list[int] = []
    for part in range(1 << po):
        cnt = (nblk >> po) - (order if part == 0 else 0)
        if cnt < 0:
            raise NotImplementedError("FLAC predictor order exceeds partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            res += [br.read_signed(raw) if raw else 0 for _ in range(cnt)]
        else:
            for _ in range(cnt):
                q = br.read_unary()
                res.append(_unzigzag((q << param) | br.read(param)))
    return res


def _decode_subframe(br: _BitReader, nblk: int, bps: int) -> list[int]:
    if br.read(1):
        raise NotImplementedError("FLAC subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if ftype == 0:
        out = [br.read_signed(bps)] * nblk
    elif ftype == 1:
        out = [br.read_signed(bps) for _ in range(nblk)]
    elif 8 <= ftype <= 12:
        order = ftype - 8
        out = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, nblk, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            k = order + i
            out.append(
                r + sum(c * out[k - 1 - j] for j, c in enumerate(coefs))
            )
    elif ftype >= 32:
        order = (ftype & 31) + 1
        out = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise NotImplementedError("invalid FLAC LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise NotImplementedError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, nblk, order)
        for i, r in enumerate(res):
            k = order + i
            pred = sum(c * out[k - 1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(r + pred)
    else:
        raise NotImplementedError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = [s << wasted for s in out]
    return out


def _decode_guard(fn):
    """Same contract as multimodal._parse_guard (kept local to avoid a
    module-level import of the 4k-line codec module): corrupt payloads
    fail with exactly one exception type, NotImplementedError naming
    the problem — never a leaked parser internal."""

    @functools.wraps(fn)
    def wrapped(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except NotImplementedError:
            raise
        except (IndexError, KeyError, ValueError, OverflowError,
                ZeroDivisionError, struct.error) as e:
            raise NotImplementedError(
                f"corrupt or unsupported payload ({fn.__name__}: "
                f"{type(e).__name__}: {e})"
            ) from e

    return wrapped


@_decode_guard
def flac_decode_pcm(payload: bytes) -> tuple[list[int], dict]:
    """Full decode → (interleaved samples, stream info dict). Verifies
    every frame-header CRC-8, every frame CRC-16, the STREAMINFO
    sample count, and the PCM MD5 — any mismatch raises (fail-closed:
    corrupt audio must never silently contribute wrong statistics)."""
    if payload[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise NotImplementedError("truncated FLAC metadata")
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise NotImplementedError("truncated FLAC metadata block")
        if hdr & 0x7F == 0:
            if blen != 34:
                raise NotImplementedError("bad STREAMINFO length")
            br = _BitReader(body)
            streaminfo = {
                "min_block": br.read(16),
                "max_block": br.read(16),
                "min_frame": br.read(24),
                "max_frame": br.read(24),
                "sample_rate": br.read(20),
                "channels": br.read(3) + 1,
                "bps": br.read(5) + 1,
                "total_samples": br.read(36),
                "md5": body[18:34],
            }
        elif hdr & 0x7F == 127:
            raise NotImplementedError("invalid FLAC metadata block type")
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise NotImplementedError("FLAC stream without STREAMINFO")
    sr0, ch0, bps0 = (
        streaminfo["sample_rate"],
        streaminfo["channels"],
        streaminfo["bps"],
    )
    # Absolute decode ceiling (r10 LZW lesson): a CONSTANT subframe
    # legally expands ~20 payload bytes into 65536 samples per frame,
    # so total output is NOT bounded by any multiple of payload size —
    # the declared 36-bit total_samples is attacker-controlled too.
    # Reject past an absolute bound, checked early (on the declaration)
    # and per frame (a lying declaration of 0 must not bypass it).
    if streaminfo["total_samples"] * ch0 > _MAX_DECODED_SAMPLES:
        raise NotImplementedError(
            "FLAC STREAMINFO declares more samples than the "
            f"{_MAX_DECODED_SAMPLES}-sample absolute decode ceiling"
        )
    samples: list[int] = []
    n_flac_frames = 0
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise NotImplementedError("FLAC frame sync lost")
        if br.read(1):
            raise NotImplementedError("reserved FLAC frame bit set")
        br.read(1)  # blocking strategy (number semantics only)
        bs_code = br.read(4)
        sr_code = br.read(4)
        assign = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise NotImplementedError("reserved FLAC frame bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise NotImplementedError("reserved FLAC block-size code")
        elif bs_code == 6:
            nblk = br.read(8) + 1
        elif bs_code == 7:
            nblk = br.read(16) + 1
        else:
            nblk = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            sr = sr0
        elif sr_code == 12:
            sr = br.read(8) * 1000
        elif sr_code == 13:
            sr = br.read(16)
        elif sr_code == 14:
            sr = br.read(16) * 10
        elif sr_code == 15:
            raise NotImplementedError("invalid FLAC sample-rate code")
        else:
            sr = _SAMPLE_RATES[sr_code]
        if ss_code == 0:
            bps = bps0
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise NotImplementedError("reserved FLAC sample-size code")
        if sr != sr0 or bps != bps0:
            raise NotImplementedError(
                "FLAC frame parameters disagree with STREAMINFO"
            )
        br.align()
        hdr_end = br.bytepos
        if _crc8(payload[frame_start:hdr_end]) != br.read(8):
            raise NotImplementedError("FLAC frame-header CRC-8 mismatch")
        if len(samples) + nblk * ch0 > _MAX_DECODED_SAMPLES:
            raise NotImplementedError(
                "FLAC stream expands past the "
                f"{_MAX_DECODED_SAMPLES}-sample absolute decode ceiling"
            )
        if assign <= 7:
            nch = assign + 1
            if nch != ch0:
                raise NotImplementedError(
                    "FLAC frame channel count disagrees with STREAMINFO"
                )
            chans = [_decode_subframe(br, nblk, bps) for _ in range(nch)]
        elif assign in (8, 9, 10):
            if ch0 != 2:
                raise NotImplementedError(
                    "stereo decorrelation in a non-stereo FLAC stream"
                )
            a = _decode_subframe(br, nblk, bps + (1 if assign == 9 else 0))
            b = _decode_subframe(br, nblk, bps + (1 if assign != 9 else 0))
            if assign == 8:  # left/side
                chans = [a, [x - s for x, s in zip(a, b)]]
            elif assign == 9:  # side/right
                chans = [[s + x for s, x in zip(a, b)], b]
            else:  # mid/side: l+r = 2*mid + (side&1), l-r = side
                left = [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(a, b)]
                chans = [left, [x - s for x, s in zip(left, b)]]
        else:
            raise NotImplementedError("reserved FLAC channel assignment")
        br.align()
        if _crc16(payload[frame_start : br.bytepos]) != br.read(16):
            raise NotImplementedError("FLAC frame CRC-16 mismatch")
        for i in range(nblk):
            for ch in chans:
                samples.append(ch[i])
        n_flac_frames += 1
        pos = br.bytepos
    if n_flac_frames == 0:
        raise NotImplementedError("FLAC stream with no audio frames")
    if streaminfo["total_samples"] and (
        len(samples) // ch0 != streaminfo["total_samples"]
    ):
        raise NotImplementedError(
            "decoded FLAC sample count disagrees with STREAMINFO"
        )
    lo, hi = -(1 << (bps0 - 1)), (1 << (bps0 - 1)) - 1
    if any(not lo <= s <= hi for s in samples):
        raise NotImplementedError("FLAC sample out of declared bit depth")
    info = {
        "sample_rate": sr0,
        "channels": ch0,
        "bps": bps0,
        "n_flac_frames": n_flac_frames,
        "md5_ok": _pcm_md5(samples, ch0, bps0) == streaminfo["md5"],
    }
    if streaminfo["md5"] != b"\x00" * 16 and not info["md5_ok"]:
        raise NotImplementedError("FLAC PCM MD5 mismatch")
    return samples, info


@_decode_guard
def decode_flac_samples(payload: bytes) -> dict:
    """→ the `decode_wav_samples` statistics contract over a FLAC
    payload: exact integer sums divided once, so a closed-form SQL
    oracle reproduces ``mean``/``rms``/``peak`` bit-for-bit."""
    samples, info = flac_decode_pcm(payload)
    n = len(samples)
    ch = info["channels"]
    total = sum(samples)
    sq = sum(s * s for s in samples)
    return {
        "format": "flac",
        "codec": f"flac{info['bps']}",
        "sample_rate": info["sample_rate"],
        "channels": ch,
        "bits": info["bps"],
        "n_frames": n // ch,
        "n_flac_frames": info["n_flac_frames"],
        "duration_sec": (n // ch) / info["sample_rate"],
        "mean": total / n,
        "rms": (sq / n) ** 0.5,
        "peak": max(abs(s) for s in samples),
        "md5_ok": info["md5_ok"],
        "compressed_bytes": len(payload),
    }
