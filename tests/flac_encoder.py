"""Minimal spec-compliant FLAC *encoder* — test fixture generator.

The environment has no flac/ffmpeg/soundfile/torchaudio, so golden FLAC files
for decoder tests are synthesized here, straight from the FLAC format spec
(frame sync, UTF-8 frame numbers, CRC-8/CRC-16, Rice residuals, fixed and LPC
predictors, wasted bits, stereo decorrelation modes).  Kept in tests/ — it is
not part of the framework (the framework only ever decodes).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def bits(self, value: int, k: int) -> None:
        value &= (1 << k) - 1
        self.acc = (self.acc << k) | value
        self.nacc += k
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def sbits(self, value: int, k: int) -> None:
        self.bits(value & ((1 << k) - 1), k)

    def align(self) -> None:
        if self.nacc:
            self.bits(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)):
        nbytes += 1
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead_mask | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _write_rice(w: BitWriter, residual: Sequence[int], param: int) -> None:
    for r in residual:
        z = (r << 1) ^ (r >> 63) if r < 0 else (r << 1)
        q = z >> param
        w.bits(0, q) if q else None
        w.bits(1, 1)
        if param:
            w.bits(z & ((1 << param) - 1), param)


def _write_residual(w: BitWriter, residual: Sequence[int], param: int,
                    escape_raw_bits: Optional[int] = None) -> None:
    # Coding method 0 (4-bit Rice), partition order 0.
    w.bits(0, 2)
    w.bits(0, 4)
    if escape_raw_bits is not None:
        w.bits(0xF, 4)                 # escape code
        w.bits(escape_raw_bits, 5)
        for r in residual:
            w.sbits(r, escape_raw_bits)
    else:
        w.bits(param, 4)
        _write_rice(w, residual, param)


def _write_subframe(w: BitWriter, samples: np.ndarray, bps: int, mode: str,
                    wasted: int = 0, rice_param: int = 10,
                    escape_raw_bits: Optional[int] = None) -> None:
    x = samples.astype(np.int64)
    if wasted:
        assert (x & ((1 << wasted) - 1) == 0).all(), "wasted bits must be zero"
        x = x >> wasted
    eff = bps - wasted

    w.bits(0, 1)  # pad
    if mode == "constant":
        assert (x == x[0]).all()
        w.bits(0, 6)
        _flag_wasted(w, wasted)
        w.sbits(int(x[0]), eff)
    elif mode == "verbatim":
        w.bits(1, 6)
        _flag_wasted(w, wasted)
        for v in x:
            w.sbits(int(v), eff)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        w.bits(8 + order, 6)
        _flag_wasted(w, wasted)
        for v in x[:order]:
            w.sbits(int(v), eff)
        coef = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}[order]
        res = [int(x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coef)))
               for i in range(order, len(x))]
        _write_residual(w, res, rice_param, escape_raw_bits)
    elif mode == "lpc":
        order, precision, shift = 2, 12, 9
        coef = [900, -420]  # arbitrary stable-ish predictor; decoder must invert
        w.bits(32 + (order - 1), 6)
        _flag_wasted(w, wasted)
        for v in x[:order]:
            w.sbits(int(v), eff)
        w.bits(precision - 1, 4)
        w.sbits(shift, 5)
        for c in coef:
            w.sbits(c, precision)
        res = []
        for i in range(order, len(x)):
            acc = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coef))
            res.append(int(x[i]) - (acc >> shift))
        _write_residual(w, res, rice_param, escape_raw_bits)
    else:
        raise ValueError(mode)


def _flag_wasted(w: BitWriter, wasted: int) -> None:
    if wasted:
        w.bits(1, 1)
        w.bits(0, wasted - 1)  # unary count: wasted-1 zeros then a 1
        w.bits(1, 1)
    else:
        w.bits(0, 1)


def encode_flac(channels: np.ndarray, sample_rate: int, bps: int = 16,
                block_size: int = 4096, mode: str = "fixed2",
                chan_mode: str = "independent", wasted: int = 0,
                rice_param: int = 10,
                escape_raw_bits: Optional[int] = None) -> bytes:
    """Encode int samples (C, N) to a FLAC byte stream.

    mode: constant|verbatim|fixed0..fixed4|lpc — subframe coding.
    chan_mode: independent|left_side|right_side|mid_side (stereo only).
    """
    channels = np.atleast_2d(np.asarray(channels, np.int64))
    n_ch, n = channels.shape
    out = bytearray(b"fLaC")

    # STREAMINFO (last metadata block).
    si = BitWriter()
    si.bits(block_size, 16)
    si.bits(block_size, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(sample_rate, 20)
    si.bits(n_ch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(n, 36)
    info = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    chan_asgn = {"independent": n_ch - 1, "left_side": 8, "right_side": 9,
                 "mid_side": 10}[chan_mode]
    if chan_mode != "independent":
        assert n_ch == 2

    frame_no = 0
    for lo in range(0, n, block_size):
        blk = channels[:, lo: lo + block_size]
        bs = blk.shape[1]

        hdr = BitWriter()
        hdr.bits(0x3FFE, 14)
        hdr.bits(0, 1)   # reserved
        hdr.bits(0, 1)   # fixed blocksize stream
        hdr.bits(7, 4)   # block size: 16-bit value - 1 follows
        hdr.bits(0, 4)   # sample rate: from STREAMINFO
        hdr.bits(chan_asgn, 4)
        hdr.bits({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        hdr.bits(0, 1)
        hdr.align()
        header = hdr.bytes() + _utf8_number(frame_no)
        header += int(bs - 1).to_bytes(2, "big")
        header += bytes([crc8(header)])

        body = BitWriter()
        if chan_asgn == 8:       # left/side: [left, left-right]
            subs = [(blk[0], bps), (blk[0] - blk[1], bps + 1)]
        elif chan_asgn == 9:     # right/side: [left-right, right]
            subs = [(blk[0] - blk[1], bps + 1), (blk[1], bps)]
        elif chan_asgn == 10:    # mid/side: [(l+r)>>1, l-r]
            subs = [((blk[0] + blk[1]) >> 1, bps), (blk[0] - blk[1], bps + 1)]
        else:
            subs = [(blk[c], bps) for c in range(n_ch)]
        for samples, sub_bps in subs:
            _write_subframe(body, samples, sub_bps, mode, wasted=wasted,
                            rice_param=rice_param,
                            escape_raw_bits=escape_raw_bits)
        body.align()

        frame = header + body.bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)
