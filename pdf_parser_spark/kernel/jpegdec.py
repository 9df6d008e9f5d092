"""JPEG codec (pure Python + numpy) for DCTDecode parity.

The reference decodes DCTDecode image streams to raster with the
``jpeg_decoder`` crate and hands ``decode_image`` an RGB/Gray buffer
(`/root/reference/src/image.rs:140-160`). No JPEG library ships in
this container, so this module implements the Huffman modes of
ITU-T T.81 from the public spec:

- decoder: baseline SOF0, extended sequential SOF1, and PROGRESSIVE
  SOF2 (spectral selection + successive approximation per Annex G,
  incl. EOB runs and AC refinement correction bits); DQT/DHT/SOS/DRI
  parsing, canonical Huffman decode, dequantize + dezigzag, separable
  float IDCT, nearest-neighbour chroma upsampling, JFIF YCbCr->RGB
  with round-half-away clamp. Arithmetic-coded modes are rejected
  with a structured JpegError.
- encoders: 4:4:4 (or gray) baseline writer plus a spectral-selection
  progressive writer, both with self-defined canonical Huffman tables
  (fixed code lengths — every table emitted is declared in DHT, so
  any spec decoder reads it back). They exist to build test fixtures
  and for the JPEG sink.

Parity strategy (documented in FIXTURES.md): IDCT rounding is
implementation-defined within spec tolerance, so cross-decoder
bit-parity is only guaranteed where the maths is exact — DC-only
blocks (per-8x8-flat images) with unit quantization decode to the
same pixels in every conforming decoder, including the reference's
``jpeg_decoder``. Fixtures are built that way; round-trip equality is
asserted for them and spec-tolerance (<=1/255 per sample) for
textured blocks.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_UNZIG = np.argsort(ZIGZAG)


def _idct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = (c / 2) * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _idct_matrix()


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D type-III DCT (inverse), float64."""
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT, float64."""
    return _A @ block @ _A.T


class JpegError(ValueError):
    pass


# Allocation sanity bound, in SAMPLES (width x height x components):
# the progressive coefficient store and the render planes each cost
# ~8 B/sample (int64/float64), so 2^25 samples caps worst-case decoder
# memory at ~0.5-0.8 GB per image INCLUDING the RGB output — far above
# any real PDF XObject (8192x4096 gray, 3300x3300 RGB), far below an
# executor-OOM 65535x65535x3 declared by a corrupt SOF. Checked before
# any store/plane allocation.
MAX_SAMPLES = 1 << 25


# ------------------------------------------------------------- huffman

def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical (length, code) -> symbol map per T.81 Annex C."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first entropy-segment reader: un-stuffs 0xFF00, stops at
    markers (caller handles RST)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        # mask off already-consumed high bits BEFORE shifting: without
        # this `cur` grows one bigint limb per scan byte and every
        # shift copies it — O(n^2) decode on megabyte scans
        self.cur = (((self.cur & ((1 << self.nbits) - 1)) << 8) | b)
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------- decoder

@dataclass
class _Component:
    cid: int
    h: int
    v: int
    tq: int
    td: int = 0
    ta: int = 0


def decode_baseline_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline (SOF0) JPEG.

    Returns (width, height, n_components, pixel bytes) — pixels are
    interleaved RGB for 3-component images (JFIF YCbCr->RGB) and
    luminance for 1-component images, matching jpeg_decoder's output
    pixel formats for the colorspaces the reference supports.

    Raises only JpegError: corrupt input (truncated segments, unknown
    scan components, missing tables) must surface as a structured
    parse failure, never as a stray exception killing the Spark task.
    """
    try:
        return _decode_baseline_jpeg(data)
    except JpegError:
        raise
    except (struct.error, StopIteration, KeyError, IndexError,
            ValueError, ZeroDivisionError) as e:
        raise JpegError(f"corrupt JPEG: {type(e).__name__}") from e
    except _MarkerHit as e:
        # marker (EOI/RST/next segment) encountered where entropy data
        # was expected: truncated or corrupt scan
        raise JpegError(f"corrupt JPEG: unexpected marker "
                        f"0x{e.marker:04X} in scan") from e


def _decode_baseline_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    store: list[np.ndarray] | None = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64],
                                        dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128],
                                        dtype=">u2").astype(np.int64)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = seg[i + 17:i + 17 + n]
                tbl = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential (same entropy
            # coding) / SOF2 progressive
            progressive = marker == 0xC2
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                # 4-component (Adobe CMYK) / 2-component JPEGs would
                # silently run the YCbCr matrix over wrong channels —
                # reject cleanly so callers fall back to passthrough
                raise JpegError(f"unsupported component count {ncomp}")
            if width * height * ncomp > MAX_SAMPLES:
                # corrupt/adversarial SOF (up to 65535x65535x3) would
                # otherwise allocate multi-GB stores/planes before any
                # entropy data is validated — fail structured instead
                raise JpegError(
                    f"image {width}x{height}x{ncomp} exceeds decoder "
                    "pixel cap")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0xF, tq))
            if progressive:
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                mcus_x = _ceil(width, 8 * hmax)
                mcus_y = _ceil(height, 8 * vmax)
                store = [np.zeros((mcus_y * c.v, mcus_x * c.h, 64),
                                  dtype=np.int64) for c in comps]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X} "
                            "(baseline/extended/progressive Huffman only)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            order = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in comps if x.cid == cs)
                comp.td, comp.ta = tdta >> 4, tdta & 0xF
                order.append(comp)
            if not progressive:
                if len(order) != len(comps):
                    # legal baseline non-interleaved multi-scan file
                    # (one SOS per component): this decoder only
                    # handles the single interleaved scan — returning
                    # here would hand back a raster built from the
                    # FIRST scan's components labeled as all of them
                    # (corrupt output downstream). Fail structured so
                    # callers take the byte-passthrough fallback.
                    raise JpegError(
                        "non-interleaved sequential scan "
                        f"({len(order)} of {len(comps)} components) "
                        "not supported")
                pixels = _decode_scan(data, pos + seglen, order, qt,
                                      huff_dc, huff_ac, width, height,
                                      restart_interval)
                return width, height, len(comps), pixels
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos + seglen, order, comps, huff_dc, huff_ac,
                width, height, restart_interval, store,
                ss, se, ahal >> 4, ahal & 0xF)
            continue
        pos += seglen
    if progressive and store is not None:
        pixels = _render_progressive(comps, store, qt, width, height)
        return width, height, len(comps), pixels
    raise JpegError("no SOS marker")


def _ceil(a: int, b: int) -> int:
    return (a + b - 1) // b


def _comp_grid(comp: _Component, comps: list[_Component],
               width: int, height: int) -> tuple[int, int]:
    """Non-interleaved block grid of one component (T.81 A.2.2):
    ceil(component samples / 8) per axis."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    return (_ceil(_ceil(width * comp.h, hmax), 8),
            _ceil(_ceil(height * comp.v, vmax), 8))


def _decode_prog_scan(data: bytes, pos: int, order: list[_Component],
                      comps: list[_Component], huff_dc: dict,
                      huff_ac: dict, width: int, height: int,
                      restart_interval: int, store: list[np.ndarray],
                      ss: int, se: int, ah: int, al: int) -> int:
    """Decode one progressive scan (T.81 Annex G) into the coefficient
    store; returns the buffer position of the next marker."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = _ceil(width, 8 * hmax)
    mcus_y = _ceil(height, 8 * vmax)
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    state = {"eobrun": 0, "units": 0}

    def maybe_restart() -> None:
        if restart_interval and state["units"] and \
                state["units"] % restart_interval == 0:
            reader.byte_align()
            while data[reader.pos] == 0xFF and \
                    0xD0 <= data[reader.pos + 1] <= 0xD7:
                reader.pos += 2
            for i in range(len(pred)):
                pred[i] = 0
            state["eobrun"] = 0

    if ss == 0:
        if se != 0:
            raise JpegError("progressive DC scan must have Se=0")
        if len(order) == 1:
            comp = order[0]
            ci = comps.index(comp)
            nbw, nbh = _comp_grid(comp, comps, width, height)
            for by in range(nbh):
                for bx in range(nbw):
                    maybe_restart()
                    _dc_prog(reader, huff_dc, comp, ci, pred,
                             store[ci][by, bx], ah, al)
                    state["units"] += 1
        else:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for comp in order:
                        ci = comps.index(comp)
                        for by in range(comp.v):
                            for bx in range(comp.h):
                                _dc_prog(
                                    reader, huff_dc, comp, ci, pred,
                                    store[ci][my * comp.v + by,
                                              mx * comp.h + bx], ah, al)
                    state["units"] += 1
    else:
        if len(order) != 1:
            raise JpegError("progressive AC scan must be single-component")
        comp = order[0]
        ci = comps.index(comp)
        tbl = huff_ac[comp.ta]
        nbw, nbh = _comp_grid(comp, comps, width, height)
        for by in range(nbh):
            for bx in range(nbw):
                maybe_restart()
                zz = store[ci][by, bx]
                if ah == 0:
                    state["eobrun"] = _ac_first(
                        reader, tbl, zz, ss, se, al, state["eobrun"])
                else:
                    state["eobrun"] = _ac_refine(
                        reader, tbl, zz, ss, se, al, state["eobrun"])
                state["units"] += 1

    # advance to the next marker (skip pad bytes / stuffing)
    p = reader.pos
    n = len(data)
    while p < n - 1 and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    return p


def _dc_prog(reader: _BitReader, huff_dc: dict, comp: _Component,
             ci: int, pred: list[int], zz: np.ndarray,
             ah: int, al: int) -> None:
    if ah == 0:                     # first DC scan: diffs at level Al
        t = reader.decode_symbol(huff_dc[comp.td])
        pred[ci] += _extend(reader.read_bits(t), t)
        zz[0] = pred[ci] << al
    else:                           # refinement: one bit per block
        if reader.read_bit():
            zz[0] |= 1 << al


def _ac_first(reader: _BitReader, tbl: dict, zz: np.ndarray,
              ss: int, se: int, al: int, eobrun: int) -> int:
    """First AC scan for one block's band (G.1.2.2); returns the
    remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:             # ZRL
                k += 16
                continue
            eob = (1 << r) - 1
            if r:
                eob += reader.read_bits(r)
            return eob
        k += r
        if k > se:
            raise JpegError("AC band overflow")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(reader: _BitReader, tbl: dict, zz: np.ndarray,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement for one block's band
    (G.1.2.3): newly-significant coefficients arrive as +-1<<Al at
    zero-history positions; every nonzero-history coefficient passed
    over (and all of them during an EOB run) absorbs one correction
    bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0             # ZRL: skip 16 zero-history coeffs
            else:
                if s != 1:
                    raise JpegError("invalid refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        return eobrun - 1
    return 0


def _render_progressive(comps: list[_Component], store: list[np.ndarray],
                        qt: dict, width: int, height: int) -> bytes:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for ci, comp in enumerate(comps):
        bh, bw = store[ci].shape[:2]
        q = qt[comp.tq]
        plane = np.empty((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                block = np.zeros(64)
                block[ZIGZAG] = store[ci][by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _idct2(block.reshape(8, 8)) + 128.0
        planes.append(plane)
    return _planes_to_pixels(comps, planes, hmax, vmax, width, height)


def _decode_scan(data: bytes, pos: int, comps: list[_Component],
                 qt: dict, huff_dc: dict, huff_ac: dict,
                 width: int, height: int, restart_interval: int) -> bytes:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    planes = [np.zeros((mcus_y * c.v * 8, mcus_x * c.h * 8))
              for c in comps]
    pred = [0] * len(comps)
    reader = _BitReader(data, pos)
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.byte_align()
                # skip the RST marker
                while data[reader.pos] == 0xFF and \
                        0xD0 <= data[reader.pos + 1] <= 0xD7:
                    reader.pos += 2
                pred = [0] * len(comps)
            for ci, comp in enumerate(comps):
                q = qt[comp.tq]
                for by in range(comp.v):
                    for bx in range(comp.h):
                        coeff = _decode_block(
                            reader, huff_dc[comp.td], huff_ac[comp.ta],
                            pred, ci)
                        deq = coeff * q
                        block = np.zeros(64)
                        block[ZIGZAG] = deq
                        spatial = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * comp.v + by) * 8
                        x0 = (mx * comp.h + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_count += 1

    return _planes_to_pixels(comps, planes, hmax, vmax, width, height)


def _planes_to_pixels(comps: list[_Component], planes: list[np.ndarray],
                      hmax: int, vmax: int, width: int, height: int
                      ) -> bytes:
    """Upsample to full resolution, crop, and colour-convert (shared
    by the sequential and progressive paths)."""
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if comp.h != hmax or comp.v != vmax:
            p = np.repeat(np.repeat(p, vmax // comp.v, axis=0),
                          hmax // comp.h, axis=1)
        full.append(p[:height, :width])

    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


def _decode_block(reader: _BitReader, dc_tbl: dict, ac_tbl: dict,
                  pred: list[int], ci: int) -> np.ndarray:
    coeff = np.zeros(64, dtype=np.int64)
    t = reader.decode_symbol(dc_tbl)
    diff = _extend(reader.read_bits(t), t)
    pred[ci] += diff
    coeff[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run overflow")
        coeff[k] = _extend(reader.read_bits(s), s)
        k += 1
    return coeff


# ------------------------------------------------------------- encoder

def _canonical_bits_vals(symbols: list[int], length: int
                         ) -> tuple[list[int], bytes]:
    """All symbols at one fixed code length (canonical, valid while
    count < 2^length so the all-ones code stays unused)."""
    if len(symbols) >= (1 << length):
        raise JpegError("too many symbols for fixed-length table")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, bytes(symbols)


_DC_SYMS = list(range(12))
_AC_SYMS = ([0x00, 0xF0]
            + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_DC_BITS, _DC_VALS = _canonical_bits_vals(_DC_SYMS, 5)
_AC_BITS, _AC_VALS = _canonical_bits_vals(_AC_SYMS, 9)
_DC_ENC = {sym: (ln, code) for (ln, code), sym
           in _build_huffman(_DC_BITS, _DC_VALS).items()}
_AC_ENC = {sym: (ln, code) for (ln, code), sym
           in _build_huffman(_AC_BITS, _AC_VALS).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, code) per T.81 F.1.2.1 — negative values one's-complement."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def encode_baseline_jpeg(pixels: bytes, width: int, height: int,
                         ncomp: int) -> bytes:
    """Minimal baseline encoder: unit quantization, 4:4:4, fixed-length
    canonical Huffman tables (declared in DHT). ``pixels`` is
    interleaved RGB (ncomp=3, converted to YCbCr) or luminance
    (ncomp=1). Per-8x8-flat gray images round-trip exactly."""
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, ncomp)
    if ncomp == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    elif ncomp == 1:
        planes = [arr[..., 0]]
    else:
        raise JpegError("ncomp must be 1 or 3")

    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1:width]
        padded.append(pp)

    w = _BitWriter()
    pred = [0] * ncomp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(ncomp):
                block = padded[ci][by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8] - 128.0
                coeff = np.round(_fdct2(block)).astype(np.int64)
                zz = coeff.reshape(64)[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, code = _magnitude(diff)
                ln, c = _DC_ENC[size]
                w.write(c, ln)
                if size:
                    w.write(code, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if \
                    np.any(zz[1:]) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, c = _AC_ENC[0xF0]
                        w.write(c, ln)
                        run -= 16
                    size, code = _magnitude(v)
                    ln, c = _AC_ENC[(run << 4) | size]
                    w.write(c, ln)
                    w.write(code, size)
                    run = 0
                if last_nz < 63:
                    ln, c = _AC_ENC[0x00]
                    w.write(c, ln)
    w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: unit quantization (table 0, 8-bit) — encode divides by 1,
    # so coefficients survive exactly; flat blocks round-trip exactly
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF0
    sof = bytearray(struct.pack(">BHHB", 8, height, width, ncomp))
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT (tables 0 for both classes; all components reference them)
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS),
                           (1, _AC_BITS, _AC_VALS)):
        payload = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _component_coeffs(pixels: bytes, width: int, height: int,
                      ncomp: int) -> list[np.ndarray]:
    """Per-component quantised (unit table) zigzag coefficient grids —
    shared front half of the baseline and progressive encoders."""
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, ncomp)
    if ncomp == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    elif ncomp == 1:
        planes = [arr[..., 0]]
    else:
        raise JpegError("ncomp must be 1 or 3")
    ph = _ceil(height, 8) * 8
    pw = _ceil(width, 8) * 8
    out = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1:width]
        zzs = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                block = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coeff = np.round(_fdct2(block)).astype(np.int64)
                zzs[by, bx] = coeff.reshape(64)[ZIGZAG]
        out.append(zzs)
    return out


def _emit_ac_band(w: "_BitWriter", zz: np.ndarray, lo: int, hi: int
                  ) -> None:
    """Baseline-style run-length coding of zz[lo..hi] with per-block
    EOB (valid first-AC-scan progressive coding with eobrun=1)."""
    band = zz[lo:hi + 1]
    nz = np.nonzero(band)[0]
    last = int(nz[-1]) if len(nz) else -1
    run = 0
    for j in range(last + 1):
        v = int(band[j])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, c = _AC_ENC[0xF0]
            w.write(c, ln)
            run -= 16
        size, code = _magnitude(v)
        ln, c = _AC_ENC[(run << 4) | size]
        w.write(c, ln)
        w.write(code, size)
        run = 0
    if last < hi - lo:
        ln, c = _AC_ENC[0x00]       # EOB: ends exactly this block
        w.write(c, ln)


def encode_progressive_jpeg(pixels: bytes, width: int, height: int,
                            ncomp: int) -> bytes:
    """Minimal PROGRESSIVE (SOF2) encoder: spectral selection only —
    one interleaved DC scan, then one full-band AC scan per component
    (Ah=Al=0 everywhere). Coefficients are identical to the baseline
    encoder's, so progressive decode must reproduce the baseline
    decode bit-for-bit (round-trip asserted in tests)."""
    comps_zz = _component_coeffs(pixels, width, height, ncomp)
    bh, bw = comps_zz[0].shape[:2]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = bytearray(struct.pack(">BHHB", 8, height, width, ncomp))
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS),
                           (1, _AC_BITS, _AC_VALS)):
        payload = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    # scan 1: interleaved DC (Ss=0 Se=0 Ah=0 Al=0)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x00\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    w = _BitWriter()
    pred = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                dc = int(comps_zz[ci][by, bx, 0])
                diff = dc - pred[ci]
                pred[ci] = dc
                size, code = _magnitude(diff)
                ln, c = _DC_ENC[size]
                w.write(c, ln)
                if size:
                    w.write(code, size)
    w.flush()
    out += w.out

    # scans 2..: per-component AC band 1..63
    for ci in range(ncomp):
        sos = bytes([1, ci + 1, 0x00]) + b"\x01\x3f\x00"
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        w = _BitWriter()
        for by in range(bh):
            for bx in range(bw):
                _emit_ac_band(w, comps_zz[ci][by, bx], 1, 63)
        w.flush()
        out += w.out

    out += b"\xff\xd9"
    return bytes(out)
