"""Pure-Python JPEG codec (baseline SOF0 + progressive SOF2) — no
external libraries.

Decoder scope (everything else raises ``NotImplementedError`` and is
degraded to a null feature by the multimodal guard, same contract as
``pngcodec``):

- baseline sequential DCT (SOF0), 8-bit precision,
- progressive DCT (SOF2): multi-scan coefficient accumulation with
  spectral selection (Ss/Se bands), successive approximation (Ah/Al
  first + refinement passes, incl. the AC correction-bit algorithm
  and EOB runs), interleaved DC scans and non-interleaved AC scans,
- 1 (grayscale) or 3 (YCbCr) components, arbitrary sampling factors
  1-2 (so 4:4:4, 4:2:2 and 4:2:0 all decode); chroma upsampling is
  sample REPLICATION (the classic baseline decoder form — documented,
  deterministic),
- restart markers (DRI/RSTn) with DC-predictor + EOB-run reset,
- 0xFF00 byte stuffing.

NOT supported: arithmetic coding, 12-bit, lossless/hierarchical,
CMYK/4-component scans.

Pixel math is pinned, deterministic, and test-verified against an
INDEPENDENT numpy reconstruction from the raw quantized coefficients
(``tests/test_multimodal.py``): dequantize -> 2-D IDCT (float64
separable transform) -> +128 -> np.round (half-even) -> clip 0..255;
YCbCr->RGB via the JFIF matrix with the same round/clip.  There is no
rounding-mode freedom left: every step is an explicit numpy op.

The encoder half (``encode_jpeg_from_coeffs``) exists for test
fixtures only: it packs CALLER-SUPPLIED quantized coefficient blocks
into a spec-valid bitstream (headers, canonical Huffman, interleaved
MCUs, byte stuffing, restarts) without ever running a forward DCT —
so decoder tests compare against closed-form pixel math, not against
an encode/decode round trip that could hide a shared transform bug.

Semantics analog: the reference decodes opaque per-row payloads with
external unpackers (``dump_pds_ana_info.py:125-163``); here the codec
itself is in-repo because the container has no image libraries.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order: index i of the scan -> (row, col) in the 8x8 block
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# standard AC run/size symbol set (baseline): (run, size) packed as
# (run << 4) | size, run 0-15, size 1-10, plus EOB (0x00) and ZRL (0xF0)
AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
DC_SYMBOLS = list(range(12))

# 8x8 IDCT basis matrix: M[u, x] = c(u) * cos((2x+1) u pi / 16) / 2,
# block = M^T @ coeffs @ M  (float64, exact same matrix both directions)
_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            / 2.0
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


def idct2(coeffs: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8x8 dequantized block (float64)."""
    return _C.T @ coeffs.astype(np.float64) @ _C


def _dezigzag(scan64: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8), dtype=np.int32)
    for i, (r, c) in enumerate(ZIGZAG):
        out[r, c] = scan64[i]
    return out


def _zigzag(block: np.ndarray) -> list[int]:
    return [int(block[r, c]) for (r, c) in ZIGZAG]


# ------------------------------------------------------------- Huffman


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (16 length counts + symbol list) -> {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decode tables in the spec's MINCODE/MAXCODE
    form — O(length) per symbol, no 2^16 lookup table."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code = 0
        k = 0
        for length in range(1, 17):
            if counts[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += counts[length - 1]
                k += counts[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.symbols[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers surface via ``expect_restart``."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy stream truncated")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("entropy stream truncated at 0xFF")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker inside entropy data: step back so the
                # segment walker / restart handler sees it
                self.pos -= 1
                raise _MarkerHit(nxt)
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.bitbuf = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart_sync(self, expected_rst: int) -> None:
        """Byte-align and consume the RSTn marker."""
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("restart marker expected")
        m = d[self.pos + 1]
        if m != 0xD0 + expected_rst:
            raise ValueError(f"wrong restart marker {m:#x}")
        self.pos += 2


class _MarkerHit(ValueError):
    """A non-RST marker appeared mid-entropy-stream (truncated scan).
    Subclasses ValueError so the multimodal null-feature guard catches
    it like any other malformed payload."""

    def __init__(self, marker: int):
        super().__init__(f"unexpected marker {marker:#x} in entropy stream")
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """Spec EXTEND: map t received magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """JPEG bytes -> (width, height, channels, row-major 8-bit pixels).

    channels is 1 (grayscale source) or 3 (RGB from YCbCr).  Raises
    ``ValueError`` for malformed input and ``NotImplementedError`` for
    valid-but-unsupported variants (see module docstring).
    """
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    progressive = False
    coeffs: dict[int, np.ndarray] | None = None  # cid -> (nby, nbx, 64)
    restart_interval = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qt[tq] = np.array(list(seg[j + 1 : j + 65]), dtype=np.int32)
                j += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(f"sampling {hi}x{vi} unsupported")
                comps.append((cid, hi, vi, tq))
            frame = (int(h), int(w), comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"frame type SOF{marker - 0xC0} unsupported"
            )
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                symbols = list(seg[j + 17 : j + 17 + n])
                table = _HuffDecoder(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                j += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            if not progressive:
                return _decode_scan(
                    data, i + 2 + seg_len, frame, qt, huff_dc, huff_ac,
                    {cid: (dc_t, ac_t) for cid, dc_t, ac_t in scan_comps},
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coeffs is None:
                _h, _w, fcomps = frame
                hmax = max(c[1] for c in fcomps)
                vmax = max(c[2] for c in fcomps)
                mcux = -(-_w // (8 * hmax))
                mcuy = -(-_h // (8 * vmax))
                coeffs = {
                    cid: np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
                    for (cid, hi, vi, _tq) in fcomps
                }
            i = _decode_scan_progressive(
                data, i + 2 + seg_len, frame, huff_dc, huff_ac,
                scan_comps, restart_interval,
                ss, se, ahal >> 4, ahal & 0x0F, coeffs,
            )
            continue
        # APPn / COM / anything else: skip
        i += 2 + seg_len
    if progressive and coeffs is not None:
        return _reconstruct_from_coeffs(frame, qt, coeffs)
    raise ValueError("no scan data (missing SOS)")


def _decode_scan(
    data, start, frame, qt, huff_dc, huff_ac, scan_tables, restart_interval
):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-area JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for (cid, hi, vi, _tq) in comps
    }
    reader = _BitReader(data, start)
    pred = {cid: 0 for (cid, *_r) in comps}
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart_sync(rst)
                rst = (rst + 1) & 7
                pred = {cid: 0 for (cid, *_r) in comps}
            for (cid, hi, vi, tq) in comps:
                dc_t, ac_t = scan_tables[cid]
                for by in range(vi):
                    for bx in range(hi):
                        block = _decode_block(
                            reader, huff_dc[dc_t], huff_ac[ac_t], pred, cid
                        )
                        deq = _dezigzag(block * qt[tq])
                        pix = idct2(deq)
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    return _planes_to_pixels(frame, planes, hmax, vmax)


def _planes_to_pixels(frame, planes, hmax, vmax):
    """Shared tail of both decode paths: upsample (replication), crop,
    level-shift, YCbCr->RGB (JFIF matrix), round half-even, clip."""
    h, w, comps = frame
    out_planes = []
    for (cid, hi, vi, _tq) in comps:
        p = planes[cid]
        # replicate subsampled components up to full MCU resolution
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0] + 128.0), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y = out_planes[0] + 128.0
    cb = out_planes[1]  # centered: level shift cancels the -128 in JFIF
    cr = out_planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255) for ch in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _decode_block(reader, dc_table, ac_table, pred, cid) -> np.ndarray:
    scan = np.zeros(64, dtype=np.int32)
    t = dc_table.decode(reader)
    if t > 11:
        raise ValueError(f"DC category {t} out of range")
    pred[cid] += _extend(reader.receive(t), t)
    scan[0] = pred[cid]
    k = 1
    while k < 64:
        sym = ac_table.decode(reader)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        scan[k] = _extend(reader.receive(size), size)
        k += 1
    return scan


# ------------------------------------------- progressive (SOF2) scans
#
# T.81 Annex G decoding: each SOS accumulates into per-component
# coefficient arrays (zig-zag order per block); pixels are produced
# once, at EOI, by `_reconstruct_from_coeffs` — through the SAME
# dequantize/IDCT/upsample/color tail as the baseline path, so the two
# frame types cannot drift apart numerically.


def _scan_units(frame, scan_comps):
    """Yield decode units for one scan: lists of (cid, by, bx, dc_t,
    ac_t) block coordinates into the MCU-padded coefficient grid.

    Interleaved scans (ns>1) walk the frame MCU grid.  Non-interleaved
    scans (ns=1) walk the COMPONENT's own ceil(samples/8) block grid —
    smaller than the MCU-padded grid for subsampled frames; the padding
    blocks are simply never coded (T.81 A.2.2 vs A.2.3).
    """
    h, w, fcomps = frame
    byid = {c[0]: c for c in fcomps}
    hmax = max(c[1] for c in fcomps)
    vmax = max(c[2] for c in fcomps)
    if len(scan_comps) > 1:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for (cid, dc_t, ac_t) in scan_comps:
                    _cid, hi, vi, _tq = byid[cid]
                    for by in range(vi):
                        for bx in range(hi):
                            unit.append(
                                (cid, my * vi + by, mx * hi + bx, dc_t, ac_t)
                            )
                yield unit
    else:
        cid, dc_t, ac_t = scan_comps[0]
        _cid, hi, vi, _tq = byid[cid]
        comp_w = -(-(w * hi) // hmax)
        comp_h = -(-(h * vi) // vmax)
        nbx = -(-comp_w // 8)
        nby = -(-comp_h // 8)
        for by in range(nby):
            for bx in range(nbx):
                yield [(cid, by, bx, dc_t, ac_t)]


def _decode_scan_progressive(
    data, start, frame, huff_dc, huff_ac, scan_comps, restart_interval,
    ss, se, ah, al, coeffs,
):
    """Decode one SOF2 scan into ``coeffs``; return the offset of the
    marker that terminates the scan's entropy data."""
    h, w, _fcomps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-area JPEG")
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"bad spectral band Ss={ss} Se={se}")
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ah != 0 and ah != al + 1:
        raise ValueError(f"bad successive approximation Ah={ah} Al={al}")
    reader = _BitReader(data, start)
    pred = {cid: 0 for (cid, _d, _a) in scan_comps}
    rst = 0
    eobrun = 0
    count = 0
    for unit in _scan_units(frame, scan_comps):
        if restart_interval and count and count % restart_interval == 0:
            reader.restart_sync(rst)
            rst = (rst + 1) & 7
            pred = {cid: 0 for cid in pred}
            eobrun = 0
        for (cid, by, bx, dc_t, ac_t) in unit:
            block = coeffs[cid][by, bx]
            if ss == 0:
                if ah == 0:  # DC first: value << Al
                    t = huff_dc[dc_t].decode(reader)
                    if t > 11:
                        raise ValueError(f"DC category {t} out of range")
                    pred[cid] += _extend(reader.receive(t), t)
                    block[0] = pred[cid] << al
                else:  # DC refinement: one raw bit (two's-complement OR)
                    if reader.read_bit():
                        block[0] = int(block[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first(
                    reader, huff_ac[ac_t], block, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine(
                    reader, huff_ac[ac_t], block, ss, se, al, eobrun
                )
        count += 1
    # skip the byte-boundary padding bits, land on the next marker
    p = reader.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] != 0x00
    ):
        p += 1
    return p


def _ac_first(reader, ac_table, block, ss, se, al, eobrun) -> int:
    """First AC pass for one block (T.81 G.2.2): run/size symbols with
    EOB-run extension; coefficients land as ``value << Al``."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac_table.decode(reader)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            block[k] = _extend(reader.receive(s), s) << al
            k += 1
        elif r != 15:  # EOBn: run of (1 << r) + bits end-of-bands
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        else:  # ZRL
            k += 16
    return 0


def _ac_refine(reader, ac_table, block, ss, se, al, eobrun) -> int:
    """AC refinement pass (T.81 G.2.3 / figure G.7): every
    already-nonzero coefficient crossed consumes a correction bit;
    run/size symbols position NEWLY nonzero coefficients among the
    zero-history ones only."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac_table.decode(reader)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:  # EOBn — refine the rest, then run down
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                s = p1 if reader.read_bit() else m1
            while k <= se:
                if block[k] != 0:
                    if reader.read_bit() and (block[k] & p1) == 0:
                        block[k] = int(block[k]) + (p1 if block[k] > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                block[k] = s
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0:
                if reader.read_bit() and (block[k] & p1) == 0:
                    block[k] = int(block[k]) + (p1 if block[k] > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_from_coeffs(frame, qt, coeffs):
    """Pixels from the accumulated progressive coefficients — same
    dequantize -> IDCT -> upsample -> color math as the baseline path
    (`_planes_to_pixels`)."""
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-area JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for (cid, hi, vi, tq) in comps:
        if tq not in qt:
            raise ValueError(f"missing quant table {tq}")
        arr = coeffs[cid]
        nby, nbx = arr.shape[0], arr.shape[1]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                deq = _dezigzag(arr[by, bx] * qt[tq])
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct2(deq)
        planes[cid] = plane
    return _planes_to_pixels(frame, planes, hmax, vmax)


# ------------------------------------------------------------- encoder
#
# Test-fixture encoder: packs caller-supplied QUANTIZED coefficient
# blocks (post-forward-DCT values as a real encoder would emit them)
# into a valid baseline bitstream.  Uses simple uniform-length
# canonical Huffman tables (DC: all 12 categories at 4 bits; AC: the
# 162 standard symbols at 8 bits) — spec-valid, trivially canonical,
# and independent of Annex K so the decoder's table PARSING is
# genuinely exercised.


def _dht_payload() -> tuple[bytes, dict[int, tuple[int, int]], dict[int, tuple[int, int]]]:
    dc_counts = [0] * 16
    dc_counts[3] = 12  # 12 symbols at length 4
    ac_counts = [0] * 16
    ac_counts[7] = len(AC_SYMBOLS)  # 162 symbols at length 8
    dc_codes = _canonical_codes(dc_counts, DC_SYMBOLS)
    ac_codes = _canonical_codes(ac_counts, AC_SYMBOLS)
    seg = (
        bytes([0x00]) + bytes(dc_counts) + bytes(DC_SYMBOLS)
        + bytes([0x10]) + bytes(ac_counts) + bytes(AC_SYMBOLS)
    )
    return seg, dc_codes, ac_codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def encode_jpeg_from_coeffs(
    width: int,
    height: int,
    components: list[dict],
    quant_tables: dict[int, list[int]],
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG bytes from quantized coefficient blocks.

    ``components``: list of dicts with keys ``id``, ``h``, ``v``
    (sampling factors), ``tq`` (quant table id) and ``blocks`` — a 2-D
    list ``blocks[by][bx]`` of 8x8 int arrays (quantized, NOT
    zig-zagged) sized to the MCU grid.  ``quant_tables``: {tq: 64
    zig-zag-order values}.  1 component = grayscale, 3 = YCbCr.
    """
    hmax = max(c["h"] for c in components)
    vmax = max(c["v"] for c in components)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    out = bytearray(b"\xff\xd8")
    for tq, vals in sorted(quant_tables.items()):
        body = bytes([tq]) + bytes(vals)
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(components)])
    for c in components:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht, dc_codes, ac_codes = _dht_payload()
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    sos = bytes([len(components)])
    for c in components:
        sos += bytes([c["id"], 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    pred = {c["id"]: 0 for c in components}
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = {c["id"]: 0 for c in components}
            for c in components:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = np.asarray(
                            c["blocks"][my * c["v"] + by][mx * c["h"] + bx],
                            dtype=np.int64,
                        )
                        _encode_block(writer, block, pred, c["id"], dc_codes, ac_codes)
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


_PROG_AC_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(11)]


def _prog_dht_payload() -> tuple[bytes, dict[int, tuple[int, int]], dict[int, tuple[int, int]]]:
    """Progressive fixture tables: the AC set must also contain the
    EOBn symbols (r<<4 for r=0..14) baseline never uses, so the full
    176-symbol grid goes in at 8 bits each (codes 0..175 — the all-ones
    code stays reserved, as T.81 requires)."""
    dc_counts = [0] * 16
    dc_counts[3] = 12
    ac_counts = [0] * 16
    ac_counts[7] = len(_PROG_AC_SYMBOLS)
    dc_codes = _canonical_codes(dc_counts, DC_SYMBOLS)
    ac_codes = _canonical_codes(ac_counts, _PROG_AC_SYMBOLS)
    seg = (
        bytes([0x00]) + bytes(dc_counts) + bytes(DC_SYMBOLS)
        + bytes([0x10]) + bytes(ac_counts) + bytes(_PROG_AC_SYMBOLS)
    )
    return seg, dc_codes, ac_codes


class _ProgACEncoder:
    """Per-scan AC entropy state (T.81 G.1.2.2-3): an EOB run counter
    plus the correction bits that ride with it (``pending``), separate
    from the bits buffered inside the current block — the same split
    libjpeg keeps as BE vs BR, because the decoder consumes the former
    right after the EOBn symbol and the latter right after the next
    in-block symbol."""

    def __init__(self, writer: "_BitWriter", ac_codes):
        self.w = writer
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def emit_eobrun(self) -> None:
        if self.eobrun == 0:
            return
        nbits = self.eobrun.bit_length() - 1
        code, length = self.ac[nbits << 4]
        self.w.write(code, length)
        if nbits:
            self.w.write(self.eobrun & ((1 << nbits) - 1), nbits)
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []
        self.eobrun = 0

    def block_first(self, block, ss, se, al) -> None:
        r = 0
        for k in range(ss, se + 1):
            v = int(block[k])
            t = abs(v) >> al  # point transform: magnitude shift (G.1.2.2)
            if t == 0:
                r += 1
                continue
            self.emit_eobrun()
            while r > 15:
                code, length = self.ac[0xF0]
                self.w.write(code, length)
                r -= 16
            nbits = t.bit_length()
            if nbits > 10:
                raise ValueError(f"AC coefficient {v} exceeds range")
            code, length = self.ac[(r << 4) | nbits]
            self.w.write(code, length)
            self.w.write(_mag_bits(t if v > 0 else -t, nbits), nbits)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def block_refine(self, block, ss, se, al) -> None:
        absval = [0] * 64
        eob = ss - 1  # position of the last NEWLY-nonzero coefficient
        for k in range(ss, se + 1):
            t = abs(int(block[k])) >> al
            absval[k] = t
            if t == 1:
                eob = k
        r = 0
        br: list[int] = []  # current block's buffered correction bits
        for k in range(ss, se + 1):
            t = absval[k]
            if t == 0:
                r += 1
                continue
            # ZRLs not foldable into the EOB must go out BEFORE this
            # coefficient is handled (libjpeg's r>15 fold rule)
            while r > 15 and k <= eob:
                self.emit_eobrun()
                code, length = self.ac[0xF0]
                self.w.write(code, length)
                r -= 16
                for b in br:
                    self.w.write(b, 1)
                br = []
            if t > 1:  # already nonzero: correction bit only, run intact
                br.append(t & 1)
                continue
            self.emit_eobrun()
            code, length = self.ac[(r << 4) | 1]
            self.w.write(code, length)
            self.w.write(1 if int(block[k]) > 0 else 0, 1)
            for b in br:
                self.w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()


def encode_progressive_jpeg_from_coeffs(
    width: int,
    height: int,
    components: list[dict],
    quant_tables: dict[int, list[int]],
    scans: list[dict],
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JPEG bytes from quantized coefficient blocks.

    Same ``components``/``quant_tables`` contract as
    ``encode_jpeg_from_coeffs``; ``scans`` is the emission-ordered list
    of scan scripts ``{"comps": [cid, ...], "ss": int, "se": int,
    "ah": int, "al": int}``.  The caller owns T.81 G.1.1 legality (DC
    before AC per component, AC scans single-component, refinements
    Ah == Al+1 over an identical band); this packer just encodes what
    it is told, so tests can also craft deliberately bad scan scripts.
    """
    zz = {}
    for c in components:
        nby, nbx = len(c["blocks"]), len(c["blocks"][0])
        arr = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                arr[by, bx] = _zigzag(
                    np.asarray(c["blocks"][by][bx], dtype=np.int64)
                )
        zz[c["id"]] = arr
    out = bytearray(b"\xff\xd8")
    for tq, vals in sorted(quant_tables.items()):
        body = bytes([tq]) + bytes(vals)
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(components)])
    for c in components:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht, dc_codes, ac_codes = _prog_dht_payload()
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    frame = (
        height,
        width,
        [(c["id"], c["h"], c["v"], c["tq"]) for c in components],
    )
    for scan in scans:
        sos = bytes([len(scan["comps"])])
        for cid in scan["comps"]:
            sos += bytes([cid, 0x00])  # DC table 0, AC table 0
        sos += bytes([scan["ss"], scan["se"], (scan["ah"] << 4) | scan["al"]])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += _encode_prog_scan_entropy(
            frame, zz, scan, dc_codes, ac_codes, restart_interval
        )
    out += b"\xff\xd9"
    return bytes(out)


def _encode_prog_scan_entropy(
    frame, zz, scan, dc_codes, ac_codes, restart_interval
) -> bytes:
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    scan_comps = [(cid, 0, 0) for cid in scan["comps"]]
    out = bytearray()
    writer = _BitWriter()
    state = _ProgACEncoder(writer, ac_codes)
    pred = {cid: 0 for cid in scan["comps"]}
    rst = 0
    count = 0
    for unit in _scan_units(frame, scan_comps):
        if restart_interval and count and count % restart_interval == 0:
            state.emit_eobrun()
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            state.w = writer
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = {cid: 0 for cid in pred}
        for (cid, by, bx, _dc_t, _ac_t) in unit:
            block = zz[cid][by, bx]
            if ss == 0:
                if ah == 0:  # DC first: arithmetic-shift point transform
                    v = int(block[0]) >> al
                    diff = v - pred[cid]
                    pred[cid] = v
                    t = _category(diff)
                    code, length = dc_codes[t]
                    writer.write(code, length)
                    if t:
                        writer.write(_mag_bits(diff, t), t)
                else:  # DC refinement: next lower bit, raw
                    writer.write((int(block[0]) >> al) & 1, 1)
            elif ah == 0:
                state.block_first(block, ss, se, al)
            else:
                state.block_refine(block, ss, se, al)
        count += 1
    state.emit_eobrun()
    writer.flush()
    out += writer.out
    return bytes(out)


def _encode_block(writer, block, pred, cid, dc_codes, ac_codes) -> None:
    scan = _zigzag(block)
    diff = scan[0] - pred[cid]
    pred[cid] = scan[0]
    t = _category(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(_mag_bits(diff, t), t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if scan[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = scan[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        t = _category(v)
        if t > 10:
            raise ValueError(f"AC coefficient {v} exceeds baseline range")
        code, length = ac_codes[(run << 4) | t]
        writer.write(code, length)
        writer.write(_mag_bits(v, t), t)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        writer.write(code, length)
