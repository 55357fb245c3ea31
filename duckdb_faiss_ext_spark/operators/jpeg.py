"""Baseline JPEG (JFIF) codec, pure numpy + stdlib (VERDICT r6 task 6).

Decoder: baseline sequential DCT (SOF0; SOF1 extended-sequential is
accepted — same entropy coding), 8-bit samples, grayscale or YCbCr with
any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers
(DRI/RSTn), multi-segment DQT/DHT.  Progressive (SOF2), arithmetic coding
(SOF9+), 12-bit precision, and hierarchical modes raise
``MediaDecodeError`` loudly — the honest stub in multimodal.py narrows to
exactly those.

Encoder (the golden-test inverse, like ``encode_png``): sequential DCT
with per-image canonical Huffman tables written into DHT (JPEG carries
its tables in-stream, so a decoder exercises the same generic
canonical-table builder on our files as on camera/web files — no Annex K
transcription anywhere, clean-room from the public spec structure:
ITU-T T.81 / RFC 2046 family).  Supports quality-style uniform quant and
2x2 chroma subsampling so the decoder's MCU interleave + upsample paths
are golden-testable.

Everything is 8x8-block numpy: the IDCT is two small matmuls per block
batch (all blocks of a component IDCT in ONE einsum), and the only
per-symbol Python is the Huffman bit loop — same trade as the PNG Paeth
row (documented corpus-scale caveat; a C-level codec swap point).

Reference parity note: the reference engine itself ships no image codecs
(its multimodal tables store opaque blobs); this module exists for the
training-data pipeline surface (SURVEY.md media operators).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from duckdb_faiss_ext_spark.operators.media_codecs import MediaDecodeError

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

# zigzag scan order: index z -> (row, col) of the 8x8 block (T.81 fig. 5)
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis: C[k, n] = c(k)/2 * cos((2n+1) k pi / 16)
_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _ck = (1.0 / np.sqrt(2.0)) if _k == 0 else 1.0
    for _n in range(8):
        _C[_k, _n] = 0.5 * _ck * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial samples."""
    return np.einsum("ki,nkl,lj->nij", _C, coefs, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _C, blocks, _C, optimize=True)


# --------------------------------------------------------------- bit I/O


class _BitReader:
    """MSB-first reader over the entropy-coded segment.  0xFF00 stuffing is
    removed by the caller; RST markers reset via ``align``."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise MediaDecodeError("jpeg: entropy data truncated")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map ``size`` magnitude bits to the signed coefficient."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


class _Huff:
    """Canonical Huffman table from a DHT segment (16 counts + symbols).
    Decode walks code lengths 1..16 with the canonical first-code/offset
    arrays — O(length) per symbol, no giant LUT (test-scale honest path)."""

    def __init__(self, counts: list, symbols: bytes):
        if sum(counts) != len(symbols):
            raise MediaDecodeError("jpeg: DHT counts/symbols mismatch")
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            self.val_ptr[length] = k
            self.min_code[length] = code
            self.max_code[length] = code + n - 1 if n else -1
            code += n
            k += n
            if code > (1 << length):
                raise MediaDecodeError("jpeg: DHT over-subscribed code space")
            code <<= 1
        self.symbols = symbols

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.max_code[length] >= 0 and code <= self.max_code[length]:
                return self.symbols[self.val_ptr[length] + code - self.min_code[length]]
        raise MediaDecodeError("jpeg: invalid Huffman code in entropy data")


# --------------------------------------------------------------- decoder


def _u16(b: bytes, i: int) -> int:
    return struct.unpack_from(">H", b, i)[0]


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/SOF1) or progressive (SOF2) JFIF -> (h, w, 3) uint8
    RGB.  Progressive support (r8): spectral selection + successive
    approximation per T.81 G.2 — DC first/refine (interleaved or not), AC
    first/refine with EOB-run decoding; coefficients accumulate across
    scans and the shared dequant+IDCT finish runs at EOI."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise MediaDecodeError("jpeg: missing SOI marker")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hf, vf, tq)])
    progressive = False
    coefs = None  # progressive: {cid: (gy, gx, 64) int32 ZIGZAG coefficients}
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise MediaDecodeError(f"jpeg: expected marker at byte {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None:
                return _finish_frame(frame, coefs, qtables)
            raise MediaDecodeError("jpeg: EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if i + 2 > n:
            raise MediaDecodeError("jpeg: truncated marker segment")
        seglen = _u16(payload, i)
        seg = payload[i + 2 : i + seglen]
        if len(seg) != seglen - 2:
            raise MediaDecodeError("jpeg: truncated marker segment")
        i += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, j).astype(np.int32)
                    j += 64
                elif pq == 1:
                    vals = np.frombuffer(seg, ">u2", 64, j).astype(np.int32)
                    j += 128
                else:
                    raise MediaDecodeError(f"jpeg: bad DQT precision {pq}")
                t = np.zeros(64, np.int32)
                t[_ZZ] = vals  # stored in zigzag order
                qtables[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                nsym = sum(counts)
                symbols = seg[j + 17 : j + 17 + nsym]
                huff[(tc, th)] = _Huff(counts, symbols)
                j += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise MediaDecodeError(f"jpeg: {prec}-bit precision not supported")
            h, w = _u16(seg, 1), _u16(seg, 3)
            nc = seg[5]
            if nc not in (1, 3):
                raise MediaDecodeError(f"jpeg: {nc}-component frames not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise MediaDecodeError(
                        f"jpeg: sampling factors {hf}x{vf} not supported"
                    )
                comps.append((cid, hf, vf, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                f"jpeg: SOF{marker - 0xC0} mode not supported — "
                "baseline/progressive only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = _u16(seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise MediaDecodeError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_tabs = {}
            scan_order = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tabs[cs] = (tt >> 4, tt & 0x0F)
                scan_order.append(cs)
            if not progressive:
                if ns != len(frame[2]):
                    raise MediaDecodeError(
                        "jpeg: multi-scan (non-interleaved) files not supported"
                    )
                return _decode_scan(
                    payload, i, frame, scan_tabs, qtables, huff, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if coefs is None:
                h, w, comps = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coefs = {
                    cid: np.zeros((mcus_y * vf, mcus_x * hf, 64), dtype=np.int32)
                    for cid, hf, vf, _tq in comps
                }
            i = _decode_prog_scan(
                payload, i, frame, scan_order, scan_tabs, (ss, se, ah, al),
                huff, restart_interval, coefs,
            )
        # APPn / COM / others: skipped
    raise MediaDecodeError("jpeg: no SOS marker found")


def _destuff(payload: bytes, start: int) -> tuple[bytes, list, int]:
    """Strip 0xFF00 stuffing from the entropy segment; record RST marker
    byte offsets (in DESTUFFED coordinates) and stop at the next true
    marker.  Returns (data, rst_offsets, end) where ``end`` is the payload
    index of the terminating marker's 0xFF (progressive decoding resumes
    the marker walk there)."""
    out = bytearray()
    rsts = []
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            i = n
            break
        m = payload[i + 1]
        if m == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            rsts.append(len(out))
            i += 2
        else:
            break  # real marker (EOI / next segment) ends the scan
    return bytes(out), rsts, i


def _decode_scan(payload, start, frame, scan_tabs, qtables, huff, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    data, _rsts, _end = _destuff(payload, start)
    br = _BitReader(data)

    # per-component block grids (MCU-aligned), ZIGZAG coefficient storage
    blocks = {}
    for cid, hf, vf, _tq in comps:
        blocks[cid] = np.zeros((mcus_y * vf, mcus_x * hf, 64), dtype=np.int32)
    pred = {cid: 0 for cid, *_ in comps}

    for cid, *_ in comps:
        if cid not in scan_tabs:
            raise MediaDecodeError(f"jpeg: component {cid} missing from SOS")
        td, ta = scan_tabs[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise MediaDecodeError("jpeg: SOS references undefined Huffman table")

    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hf, vf, _tq in comps:
                td, ta = scan_tabs[cid]
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                for by in range(vf):
                    for bx in range(hf):
                        zz = np.zeros(64, dtype=np.int32)
                        size = dc_tab.decode(br)
                        if size > 11:
                            raise MediaDecodeError("jpeg: DC size out of range")
                        diff = _extend(br.read_bits(size), size)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(br)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise MediaDecodeError("jpeg: AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        blocks[cid][my * vf + by, mx * hf + bx] = zz
            mcu_count += 1
    return _finish_frame(frame, blocks, qtables)


def _finish_frame(frame, coefzz: dict, qtables: dict) -> np.ndarray:
    """Shared decode finish: ZIGZAG coefficient grids (gy, gx, 64) per
    component -> dequantize + IDCT + upsample + color transform."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # dequantize + IDCT per component (ONE einsum per component), assemble
    planes = {}
    for cid, hf, vf, tq in comps:
        if tq not in qtables:
            raise MediaDecodeError(f"jpeg: undefined quant table {tq}")
        grid = coefzz[cid]
        gy, gx = grid.shape[:2]
        nat = np.zeros((gy * gx, 64), dtype=np.int32)
        nat[:, _ZZ] = grid.reshape(-1, 64)
        coefs = nat.reshape(-1, 8, 8).astype(np.float64) * qtables[tq][None, :, :]
        spat = _idct_blocks(coefs) + 128.0
        plane = (
            spat.reshape(gy, gx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        )
        # upsample to full MCU-aligned resolution, then crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // vf, axis=0), hmax // hf, axis=1)
        planes[cid] = plane[:h, :w]

    order = [c[0] for c in comps]
    if len(order) == 1:
        # round (not truncate) to match the YCbCr path's sample treatment
        y = np.clip(np.round(planes[order[0]]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    y, cb, cr = (planes[c] for c in order)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_prog_scan(
    payload, start, frame, scan_order, scan_tabs, band, huff, ri, coefs
) -> int:
    """Decode ONE progressive scan into the persistent zigzag coefficient
    grids (T.81 G.2; bit-level algorithms follow the spec's G.1.2.x flow).
    Returns the payload index where the marker walk resumes."""
    h, w, comps = frame
    ss, se, ah, al = band
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    cmap = {cid: (hf, vf) for cid, hf, vf, _tq in comps}
    data, _rsts, end = _destuff(payload, start)
    br = _BitReader(data)
    state = {"eobrun": 0, "pred": {cid: 0 for cid in scan_order}}
    # same undefined-table guard the sequential path applies before its MCU
    # walk: a scan referencing a never-defined DHT slot must surface as the
    # module's MediaDecodeError contract, not a bare KeyError (ADVICE r8)
    for cid in scan_order:
        td, ta = scan_tabs[cid]
        if ss == 0 and ah == 0 and (0, td) not in huff:
            raise MediaDecodeError("jpeg: SOS references undefined Huffman table")
        if ss > 0 and (1, ta) not in huff:
            raise MediaDecodeError("jpeg: SOS references undefined Huffman table")

    def dc_first(zz, cid):
        tab = huff[(0, scan_tabs[cid][0])]
        size = tab.decode(br)
        if size > 11:
            raise MediaDecodeError("jpeg: DC size out of range")
        state["pred"][cid] += _extend(br.read_bits(size), size)
        zz[0] = state["pred"][cid] << al

    def dc_refine(zz, _cid):
        if br.read_bit():
            zz[0] |= 1 << al

    def ac_first(zz, cid):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        tab = huff[(1, scan_tabs[cid][1])]
        k = ss
        while k <= se:
            rs = tab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:  # EOBn: run of 2^r + bits blocks (this one incl.)
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise MediaDecodeError("jpeg: AC run past band end")
            zz[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def ac_refine(zz, cid):
        # T.81 G.1.2.3 (correction-bit refinement); mirrors the classical
        # public-domain decoder control flow
        p1, m1 = 1 << al, -1 << al
        tab = huff[(1, scan_tabs[cid][1])]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = tab.decode(br)
                r, s = rs >> 4, rs & 0x0F
                s_val = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.read_bits(r)
                        break
                    # r == 15: pass over 16 zero-history coefficients
                else:
                    if s != 1:
                        raise MediaDecodeError("jpeg: bad AC refine size")
                    s_val = p1 if br.read_bit() else m1
                while k <= se:
                    v = int(zz[k])
                    if v != 0:
                        if br.read_bit() and (v & p1) == 0:
                            zz[k] = v + (p1 if v >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    zz[k] = s_val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                v = int(zz[k])
                if v != 0 and br.read_bit() and (v & p1) == 0:
                    zz[k] = v + (p1 if v >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    if ss == 0:
        if se != 0:
            raise MediaDecodeError("jpeg: progressive DC scan must have Se=0")
        block_fn = dc_refine if ah else dc_first
    else:
        if len(scan_order) != 1:
            raise MediaDecodeError("jpeg: progressive AC scan must be single-component")
        block_fn = ac_refine if ah else ac_first

    def restart(unit_count):
        if ri and unit_count and unit_count % ri == 0:
            br.align()
            state["eobrun"] = 0
            state["pred"] = {cid: 0 for cid in scan_order}

    if len(scan_order) > 1:  # interleaved (DC scans only): MCU raster
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                restart(unit)
                for cid in scan_order:
                    hf, vf = cmap[cid]
                    for by in range(vf):
                        for bx in range(hf):
                            block_fn(coefs[cid][my * vf + by, mx * hf + bx], cid)
                unit += 1
    else:  # non-interleaved: raster over the component's OWN block grid
        cid = scan_order[0]
        hf, vf = cmap[cid]
        # comp sample dims: ceil(w * hf / hmax) x ceil(h * vf / vmax)
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        unit = 0
        for by in range(nby):
            for bx in range(nbx):
                restart(unit)
                block_fn(coefs[cid][by, bx], cid)
                unit += 1
    return end


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits  # pad with 0s (decoder never reads them)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _canonical_table(symbols: list) -> tuple[list, bytes, dict]:
    """Uniform-length canonical Huffman over the USED symbols: length
    L = ceil(log2(nsym + 1)) leaves code space slack (no all-ones code).
    Returns (DHT counts[16], DHT symbol bytes, symbol -> (code, L))."""
    syms = sorted(set(symbols))
    nsym = len(syms)
    length = max(1, int(np.ceil(np.log2(nsym + 1))))
    counts = [0] * 16
    counts[length - 1] = nsym
    codes = {s: (c, length) for c, s in enumerate(syms)}
    return counts, bytes(syms), codes


def _mag_bits(v: int) -> tuple[int, int]:
    """Signed coefficient -> (size, magnitude-bit pattern) per T.81 F.12."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return (size, v) if v > 0 else (size, v + (1 << size) - 1)


def _rgb_quantized(px: np.ndarray, quant: int, subsample: bool):
    """Shared encoder front half: RGB -> padded YCbCr planes -> FDCT ->
    quantized ZIGZAG blocks.  Both the baseline and progressive encoders
    call this, so the SAME coefficient arrays back both stream kinds —
    the progressive round-trip test pins pixel-exact equality between the
    two decodes on that identity."""
    h, w = px.shape[:2]
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    hf = vf = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hf, 8 * vf
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    def pad(plane, ph, pw):
        out = np.empty((ph, pw), dtype=np.float64)
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1] :] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    yp = pad(y, mcus_y * mcu_h, mcus_x * mcu_w)
    if subsample:
        cbp = pad(cb, mcus_y * mcu_h, mcus_x * mcu_w)
        crp = pad(cr, mcus_y * mcu_h, mcus_x * mcu_w)
        cbp = cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        crp = crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
    else:
        cbp = pad(cb, mcus_y * 8, mcus_x * 8)
        crp = pad(cr, mcus_y * 8, mcus_x * 8)

    q = np.full((8, 8), int(quant), dtype=np.int32)

    def quantize(plane):
        gy, gx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coefs = _fdct_blocks(blocks) / q[None, :, :]
        zz = np.round(coefs).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        return zz.reshape(gy, gx, 64)

    return mcus_x, mcus_y, (quantize(yp), quantize(cbp), quantize(crp)), q


def encode_jpeg(
    pixels: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    gray: bool = False,
    restart: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``quant``: uniform quantizer step for every coefficient (1 = near
    lossless, bigger = lossier).  ``subsample=True`` writes 4:2:0 chroma
    (2x2-averaged), exercising the decoder's MCU interleave + upsample.
    ``gray=True`` writes a single-component (luminance-only) frame.
    ``restart``: emit a DRI segment and RSTn markers every that many MCUs
    (exercises the decoder's byte-align + predictor-reset path)."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim != 3 or px.shape[2] != 3:
        raise MediaDecodeError(f"encode_jpeg: need (h, w, 3), got {px.shape}")
    h, w = px.shape[:2]
    if gray:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        return _encode_gray(y, h, w, int(quant))
    hf = vf = 2 if subsample else 1
    mcus_x, mcus_y, (zy, zcb, zcr), q = _rgb_quantized(px, int(quant), subsample)

    # ---- one pass to collect symbols (per class), then canonical tables
    def block_symbols(zz_prev_dc, zz, dc_syms, ac_syms):
        size, _ = _mag_bits(int(zz[0]) - zz_prev_dc)
        dc_syms.append(size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.append(0xF0)
                run -= 16
            s, _ = _mag_bits(v)
            ac_syms.append((run << 4) | s)
            run = 0
        if run:
            ac_syms.append(0x00)
        return int(zz[0])

    # interleave order: MCU raster, Y blocks then Cb then Cr
    def iter_mcus():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                blocks = [
                    (0, zy[my * vf + by, mx * hf + bx])
                    for by in range(vf)
                    for bx in range(hf)
                ]
                blocks.append((1, zcb[my, mx]))
                blocks.append((2, zcr[my, mx]))
                yield blocks

    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    pred = [0, 0, 0]
    for m, mcu in enumerate(iter_mcus()):
        if restart and m and m % restart == 0:
            pred = [0, 0, 0]  # DC predictors reset at restart boundaries
        for comp, zz in mcu:
            cls = 0 if comp == 0 else 1
            pred[comp] = block_symbols(pred[comp], zz, dc_syms[cls], ac_syms[cls])
    # EOB/size symbols must exist even for constant images
    for cls in (0, 1):
        dc_syms[cls].append(0)
        ac_syms[cls].append(0x00)

    tables = {}
    dht_payload = bytearray()
    for cls in (0, 1):
        for tc, syms in ((0, dc_syms[cls]), (1, ac_syms[cls])):
            counts, symbytes, codes = _canonical_table(syms)
            tables[(tc, cls)] = codes
            dht_payload.append((tc << 4) | cls)
            dht_payload.extend(counts)
            dht_payload.extend(symbytes)

    # ---- entropy-code the scan
    bw = _BitWriter()
    pred = [0, 0, 0]
    for m, mcu in enumerate(iter_mcus()):
        if restart and m and m % restart == 0:
            bw.flush()  # byte-align, then a raw RSTn marker (never stuffed)
            bw.out += bytes([0xFF, 0xD0 + ((m // restart - 1) % 8)])
            pred = [0, 0, 0]
        for comp, zz in mcu:
            cls = 0 if comp == 0 else 1
            dc_codes, ac_codes = tables[(0, cls)], tables[(1, cls)]
            size, bits = _mag_bits(int(zz[0]) - pred[comp])
            pred[comp] = int(zz[0])
            c, ln = dc_codes[size]
            bw.write(c, ln)
            if size:
                bw.write(bits, size)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    bw.write(c, ln)
                    run -= 16
                s, bits = _mag_bits(v)
                c, ln = ac_codes[(run << 4) | s]
                bw.write(c, ln)
                bw.write(bits, s)
                run = 0
            if run:
                c, ln = ac_codes[0x00]
                bw.write(c, ln)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = np.zeros(64, np.int32)
    zz_q[:] = q.reshape(-1)[_ZZ]
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_q))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hf << 4) | vf, 0])  # Y
    sof += bytes([2, 0x11, 0])  # Cb
    sof += bytes([3, 0x11, 0])  # Cr
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes(dht_payload))
    if restart:
        out += seg(0xDD, int(restart).to_bytes(2, "big"))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# default progressive scan script: interleaved DC first + refine, luma AC
# split into two spectral bands with one successive-approximation level,
# chroma AC straight to full precision — exercises every decoder path
# (DC first/refine, AC first at Al>0 and Al=0, AC refine, EOB runs, ZRL)
_PROG_SCANS = [
    ((0, 1, 2), 0, 0, 0, 1),  # DC all components, Al=1
    ((0,), 1, 5, 0, 1),  # Y AC 1-5 first, Al=1
    ((0,), 6, 63, 0, 1),  # Y AC 6-63 first, Al=1
    ((1,), 1, 63, 0, 0),  # Cb AC full precision
    ((2,), 1, 63, 0, 0),  # Cr AC full precision
    ((0, 1, 2), 0, 0, 1, 0),  # DC refine
    ((0,), 1, 5, 1, 0),  # Y AC 1-5 refine
    ((0,), 6, 63, 1, 0),  # Y AC 6-63 refine
]


def _pt(v: int, al: int) -> int:
    """Point transform: v / 2^Al toward zero (T.81 G.1.2.1)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _ProgScanWriter:
    """Entropy writer for one progressive scan over a block sequence.
    Two-phase like the baseline encoder: collect() gathers Huffman symbols,
    emit() writes bits with the canonical table built from them."""

    def __init__(self, band):
        self.ss, self.se, self.ah, self.al = band
        self.syms: list = []
        self.bw = None
        self.codes = None
        self.eobrun = 0
        self.pending: list = []  # correction bits owed to the open EOB run
        self.pred: dict = {}
        self._rst = 0

    def restart_boundary(self):
        """RSTn boundary (T.81 E.1.4): close the open EOB run, byte-align,
        emit the marker, reset DC predictors — mirrored by the decoder's
        align + eobrun/pred reset."""
        self._flush_eob()
        self.pred = {}
        if self.bw is not None:
            self.bw.flush()
            self.bw.out += bytes([0xFF, 0xD0 + (self._rst % 8)])
        self._rst += 1

    # ---- symbol sinks: collect phase appends, emit phase writes bits
    def _sym(self, s):
        if self.bw is None:
            self.syms.append(s)
        else:
            c, ln = self.codes[s]
            self.bw.write(c, ln)

    def _bits(self, value, n):
        if self.bw is not None and n:
            self.bw.write(value, n)

    def _flush_eob(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self._sym(r << 4)
            self._bits(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self._bits(b, 1)
        self.pending = []

    # ---- per-block encoders
    def dc_first(self, zz, cid):
        # DC point transform is an ARITHMETIC shift (T.81 G.1.2.1) — floor,
        # not toward-zero; Python's >> on negative ints is exactly that
        v = int(zz[0]) >> self.al
        diff = v - self.pred.get(cid, 0)
        self.pred[cid] = v
        size, bits = _mag_bits(diff)
        self._sym(size)
        self._bits(bits, size)

    def dc_refine(self, zz, _cid):
        self._bits((int(zz[0]) >> self.al) & 1, 1)

    def ac_first(self, zz, _cid):
        run = 0
        for k in range(self.ss, self.se + 1):
            v = _pt(int(zz[k]), self.al)  # AC point transform: toward zero
            if v == 0:
                run += 1
                continue
            self._flush_eob()
            while run > 15:
                self._sym(0xF0)  # ZRL
                run -= 16
            size, bits = _mag_bits(v)
            self._sym((run << 4) | size)
            self._bits(bits, size)
            run = 0
        if run > 0:
            # band ends in zeros (or is all-zero): extend the EOB run
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def ac_refine(self, zz, _cid):
        # mirror of the decoder's G.1.2.3 flow: RS symbols count only
        # ZERO-HISTORY positions; history coefficients contribute one
        # correction bit each, buffered and emitted after the NEXT emitted
        # symbol (ZRL or significance code), or with the EOB run they fold
        # into — the decoder consumes them positionally during its advance
        vals = [_pt(int(zz[k]), self.al) for k in range(self.ss, self.se + 1)]
        # last NEWLY-significant position (|v| == 1); beyond it, the block
        # folds into an EOB run
        eob = -1
        for j, v in enumerate(vals):
            if abs(v) == 1:
                eob = j
        run = 0
        block_bits: list = []  # correction bits since the last emitted symbol
        for j, v in enumerate(vals):
            a = abs(v)
            if a == 0:
                run += 1
                continue
            # ZRL flushing happens at ANY nonzero position (history or new)
            # while the decoder is still inside the significance region
            while run > 15 and j <= eob:
                self._flush_eob()
                self._sym(0xF0)
                for b in block_bits:
                    self._bits(b, 1)
                block_bits = []
                run -= 16
            if a > 1:
                # history coefficient: buffer its Al-level magnitude bit
                block_bits.append(a & 1)
                continue
            # newly significant (|v| == 1)
            self._flush_eob()
            self._sym((run << 4) | 1)
            self._bits(1 if v > 0 else 0, 1)
            for b in block_bits:
                self._bits(b, 1)
            block_bits = []
            run = 0
        if run > 0 or block_bits:
            self.eobrun += 1
            self.pending.extend(block_bits)
            if self.eobrun == 0x7FFF or len(self.pending) > 900:
                self._flush_eob()

    def block(self, zz, cid):
        if self.ss == 0:
            (self.dc_refine if self.ah else self.dc_first)(zz, cid)
        else:
            (self.ac_refine if self.ah else self.ac_first)(zz, cid)

    def finish_pass(self):
        self._flush_eob()
        self.pred = {}


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    scans=None,
    restart: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF bytes.

    Quantizes through the SAME front half as the baseline encoder
    (``_rgb_quantized``), so ``decode_jpeg`` of the progressive stream is
    pixel-identical to the baseline stream at the same ``quant`` — the
    round-trip identity the tests pin."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim != 3 or px.shape[2] != 3:
        raise MediaDecodeError(f"encode_jpeg_progressive: need (h, w, 3), got {px.shape}")
    h, w = px.shape[:2]
    hf = vf = 2 if subsample else 1
    mcus_x, mcus_y, zblocks, q = _rgb_quantized(px, int(quant), subsample)
    scans = scans or _PROG_SCANS
    samp = {0: (hf, vf), 1: (1, 1), 2: (1, 1)}

    def iter_scan_units(scomp):
        """Yield (unit, [(zz, comp), ...]) — the restart unit is one MCU
        for interleaved scans, one block for non-interleaved (T.81 E.1.4)."""
        if len(scomp) > 1:  # interleaved DC: MCU raster
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks = []
                    for comp in scomp:
                        chf, cvf = samp[comp]
                        for by in range(cvf):
                            for bx in range(chf):
                                blocks.append(
                                    (zblocks[comp][my * cvf + by, mx * chf + bx], comp)
                                )
                    yield unit, blocks
                    unit += 1
        else:  # single component: its own (non-MCU-padded) block raster
            comp = scomp[0]
            chf, cvf = samp[comp]
            cw = -(-(w * chf) // hf)
            ch = -(-(h * cvf) // vf)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            unit = 0
            for by in range(nby):
                for bx in range(nbx):
                    yield unit, [(zblocks[comp][by, bx], comp)]
                    unit += 1

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = np.zeros(64, np.int32)
    zz_q[:] = q.reshape(-1)[_ZZ]
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_q))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hf << 4) | vf, 0])
    sof += bytes([2, 0x11, 0])
    sof += bytes([3, 0x11, 0])
    out += seg(0xC2, bytes(sof))

    if restart:
        out += seg(0xDD, int(restart).to_bytes(2, "big"))

    for scomp, ss, se, ah, al in scans:
        wtr = _ProgScanWriter((ss, se, ah, al))

        def run_pass(wtr=wtr, scomp=scomp):
            for unit, blocks in iter_scan_units(scomp):
                if restart and unit and unit % restart == 0:
                    wtr.restart_boundary()
                for zz, comp in blocks:
                    wtr.block(zz, comp)
            wtr.finish_pass()

        run_pass()  # pass 1: symbols
        needs_table = not (ss == 0 and ah)  # DC refine is raw bits only
        tc = 0 if ss == 0 else 1
        if needs_table:
            wtr.syms.append(0x00)  # guarantee a nonempty, EOB-capable table
            counts, symbytes, codes = _canonical_table(wtr.syms)
            out += seg(0xC4, bytes([(tc << 4) | 0]) + bytes(counts) + symbytes)
            wtr.codes = codes
        else:
            wtr.codes = {}
        # pass 2: bits
        wtr.bw = _BitWriter()
        wtr.eobrun = 0
        wtr.pending = []
        wtr.pred = {}
        wtr._rst = 0
        run_pass()
        wtr.bw.flush()
        sos = bytearray([len(scomp)])
        for comp in scomp:
            sos += bytes([comp + 1, 0x00])  # table 0 for both classes
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, bytes(sos))
        out += wtr.bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_gray(y: np.ndarray, h: int, w: int, quant: int) -> bytes:
    """Single-component baseline frame (exercises the decoder's grayscale
    path: Y replicated to RGB on decode)."""
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    out_h, out_w = mcus_y * 8, mcus_x * 8
    plane = np.empty((out_h, out_w), dtype=np.float64)
    plane[:h, :w] = y
    plane[h:, :w] = y[-1:, :]
    plane[:, w:] = plane[:, w - 1 : w]
    q = np.full((8, 8), quant, dtype=np.int32)
    blocks = (
        plane.reshape(mcus_y, 8, mcus_x, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    zz = np.round(_fdct_blocks(blocks) / q[None, :, :]).astype(np.int32).reshape(
        -1, 64
    )[:, _ZZ].reshape(mcus_y, mcus_x, 64)

    dc_syms: list = [0]
    ac_syms: list = [0x00]
    pred = 0
    seq = [zz[my, mx] for my in range(mcus_y) for mx in range(mcus_x)]
    for blk in seq:
        size, _ = _mag_bits(int(blk[0]) - pred)
        pred = int(blk[0])
        dc_syms.append(size)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.append(0xF0)
                run -= 16
            s, _ = _mag_bits(v)
            ac_syms.append((run << 4) | s)
            run = 0
        if run:
            ac_syms.append(0x00)
    dc_counts, dc_symbytes, dc_codes = _canonical_table(dc_syms)
    ac_counts, ac_symbytes, ac_codes = _canonical_table(ac_syms)

    bw = _BitWriter()
    pred = 0
    for blk in seq:
        size, bits = _mag_bits(int(blk[0]) - pred)
        pred = int(blk[0])
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            bw.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                run -= 16
            s, bits = _mag_bits(v)
            c, ln = ac_codes[(run << 4) | s]
            bw.write(c, ln)
            bw.write(bits, s)
            run = 0
        if run:
            c, ln = ac_codes[0x00]
            bw.write(c, ln)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = q.reshape(-1)[_ZZ].astype(np.int32)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_q))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1])
    sof += bytes([1, 0x11, 0])
    out += seg(0xC0, bytes(sof))
    dht = bytearray([0x00]) + bytes(dc_counts) + dc_symbytes
    dht += bytes([0x10]) + bytes(ac_counts) + ac_symbytes
    out += seg(0xC4, bytes(dht))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
