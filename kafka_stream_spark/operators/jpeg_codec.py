"""JPEG (ITU-T T.81) codec — dependency-free (stdlib + numpy).

Completes the real-decoder family (PPM/BMP/PNG/GIF/Y4M/WAV) with the
one ubiquitous format that was still stubbed. The DECODER handles both
baseline sequential (SOF0) and progressive (SOF2) frames: arbitrary
DQT/DHT tables from the stream, grayscale and 3-component scans,
sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), byte-stuffed entropy
data, DRI/RSTn restart intervals; progressive scans support spectral
selection AND successive approximation (DC/AC first + refinement
passes, EOB-run coding, per T.81 Annex G.1.2/G.2). Arithmetic coding
(SOF9/11) raises a typed error naming the feature. The ENCODER exists
to synthesize real test corpora: uniform quantization and flat 9-bit
canonical Huffman tables (legal per T.81 — DHT carries whatever
canonical lengths the encoder declares, and 9-bit codes for <=255
symbols keep the all-ones code unused as the spec expects), 4:4:4 or
4:2:0, optional restart intervals, and ``progressive=True`` emits the
classic DC-first/AC-band/refinement scan script so the progressive
decode paths round-trip against real multi-scan streams.

Public spec: ITU-T T.81 / ISO 10918-1 (marker syntax Annex B, Huffman
coding Annex C/F, progressive control Annex G, DCT Annex A); JFIF 1.02
for the YCbCr matrix. Numerics: orthonormal separable 8x8 DCT-II in
float64 — not cross-engine-oracle-gated (the byte-level oracle corpus
uses the exact ASCII formats); JPEG here feeds ``extract_features``'s
real-decode path, which is tolerance-tested like the other lossy media
paths.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_Q_UNIFORM = 12  # encoder quantization step (both tables)


class JpegError(ValueError):
    """Malformed or unsupported JPEG stream."""


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    mat = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    mat[0] *= 1 / np.sqrt(2)
    return mat * 0.5


_C = _dct_matrix()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# ---------------------------------------------------------------------------
# bit I/O with FF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def pad_to_byte(self) -> None:
        while self.nbits:
            self.write(1, 1)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegError("truncated entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise JpegError("marker inside entropy-coded data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, m: int) -> None:
        """Byte-align and consume the next RSTm marker (restart)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (m & 7)
        ):
            raise JpegError("expected restart marker")
        self.pos += 2


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) -> symbol, from the DHT canonical description."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                raise JpegError("bad DHT: more codes than symbols")
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """Encoder tables: every symbol at length 9 (canonical order)."""
    syms = sorted(set(symbols))
    if len(syms) > 255:
        raise JpegError("too many Huffman symbols")
    counts = [0] * 16
    counts[8] = len(syms)  # all codes 9 bits long
    enc = {}
    code = 0  # canonical: first 9-bit code is 0 (no shorter codes exist)
    for s in syms:
        enc[s] = (9, code)
        code += 1
    return counts, syms, enc


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_block_symbols(q: np.ndarray, pred: int) -> tuple[list, int]:
    """(symbol stream, new DC predictor) for one quantized block.
    Symbols: ('dc', cat, bits) then ('ac', runsize, cat, bits)."""
    zz = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
    out = []
    diff = zz[0] - pred
    s = _category(diff)
    bits = diff if diff >= 0 else diff + (1 << s) - 1
    out.append(("dc", s, bits))
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, 64):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            out.append(("ac", 0xF0, 0, 0))
            run -= 16
        s = _category(zz[i])
        bits = zz[i] if zz[i] >= 0 else zz[i] + (1 << s) - 1
        out.append(("ac", (run << 4) | s, s, bits))
        run = 0
    if last_nz < 63:
        out.append(("ac", 0x00, 0, 0))
    return out, zz[0]


def encode_jpeg(
    pixels,
    subsampling: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """``pixels``: rows of (r, g, b) tuples (or ndarray HxWx3 / HxW).
    ``progressive=True`` emits an SOF2 multi-scan stream (spectral
    bands + successive approximation) instead of baseline SOF0."""
    arr = np.asarray(pixels, dtype=np.float64)
    if grayscale:
        if arr.ndim == 3:
            arr = arr[..., 0]
        planes = [arr]
        factors = [(1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsampling == "420":
            factors = [(2, 2), (1, 1), (1, 1)]
            planes = [y, _subsample2(cb), _subsample2(cr)]
        elif subsampling == "444":
            factors = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
        else:
            raise JpegError(f"unsupported subsampling {subsampling}")
    h, w = arr.shape[:2]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad planes to whole blocks of their own grid (edge replication)
    padded = []
    for p, (hf, vf) in zip(planes, factors):
        ph, pw = mcus_y * vf * 8, mcus_x * hf * 8
        pp = np.empty((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(pp)

    if progressive:
        if restart_interval:
            raise JpegError("progressive encoder does not emit restarts")
        qt = np.full((8, 8), float(_Q_UNIFORM))
        return _encode_progressive(
            padded, factors, qt, h, w, [0] + [1] * (len(planes) - 1)
        )

    # quantize all blocks in MCU order, collecting symbol streams
    qt = np.full((8, 8), float(_Q_UNIFORM))
    all_syms: list[list] = []
    preds = [0] * len(planes)
    mcu_count = 0
    restarts: list[int] = []  # symbol-stream indices where restarts go
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                restarts.append(len(all_syms))
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (hf, vf)) in enumerate(zip(padded, factors)):
                for by in range(vf):
                    for bx in range(hf):
                        y0 = (my * vf + by) * 8
                        x0 = (mx * hf + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        q = np.round(_fdct(block) / qt)
                        syms, preds[ci] = _encode_block_symbols(q, preds[ci])
                        all_syms.append([("comp", ci)] + syms)

    # build flat Huffman tables from the observed symbols
    dc_syms = [[] for _ in planes]
    ac_syms = [[] for _ in planes]
    cur = 0
    for blk in all_syms:
        ci = blk[0][1]
        for t in blk[1:]:
            if t[0] == "dc":
                dc_syms[ci].append(t[1])
            else:
                ac_syms[ci].append(t[1])
    # table ids: luma uses 0, chroma shares 1
    tsel = [0] + [1] * (len(planes) - 1)
    dc_tables = {}
    ac_tables = {}
    for tid in set(tsel):
        members = [i for i, t in enumerate(tsel) if t == tid]
        dc_tables[tid] = _flat_table(
            [s for m in members for s in dc_syms[m]] or [0]
        )
        ac_tables[tid] = _flat_table(
            [s for m in members for s in ac_syms[m]] or [0]
        )

    # emit markers
    out = bytearray(b"\xff\xd8")  # SOI
    qt_zz = bytes(int(qt.flat[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt_zz  # DQT 0
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (hf, vf) in enumerate(factors):
        sof += struct.pack(">BBB", ci + 1, (hf << 4) | vf, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof  # SOF0
    for cls, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (counts, syms, _enc) in sorted(tables.items()):
            body = bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded data
    wr = _BitWriter()
    rst_at = set(restarts)
    rst_n = 0
    for bi, blk in enumerate(all_syms):
        if bi in rst_at:
            wr.pad_to_byte()
            wr.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
            rst_n += 1
        ci = blk[0][1]
        tid = tsel[ci]
        dc_enc = dc_tables[tid][2]
        ac_enc = ac_tables[tid][2]
        for t in blk[1:]:
            if t[0] == "dc":
                _, s, bits = t
                ln, code = dc_enc[s]
                wr.write(code, ln)
                if s:
                    wr.write(bits, s)
            else:
                _, sym, s, bits = t
                ln, code = ac_enc[sym]
                wr.write(code, ln)
                if s:
                    wr.write(bits, s)
    wr.pad_to_byte()
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder — classic DC-first / AC-band / refinement script
# ---------------------------------------------------------------------------


def _encode_progressive(padded: list, factors: list, qt: np.ndarray,
                        h: int, w: int, tsel: list) -> bytes:
    """Emit an SOF2 stream with the libjpeg-style scan script:
    DC first (interleaved, Al=1) → AC bands 1-5 / 6-63 per component
    (Al=1) → DC refinement (raw bits) → AC band refinements (Ah=1).
    Successive approximation codes sign(v)*(|v|>>Al) first and the
    dropped magnitude bit in the refinement pass, so the decoder's
    correction-bit paths (T.81 G.1.2.3) are exercised end-to-end."""
    n_comp = len(padded)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = padded[0].shape[1] // (8 * factors[0][0])
    mcus_y = padded[0].shape[0] // (8 * factors[0][1])

    # quantize every block, keep zigzag-order int vectors per comp grid
    zz_all = []
    for p, (hf, vf) in zip(padded, factors):
        bh, bw = mcus_y * vf, mcus_x * hf
        zz = np.zeros((bh, bw, 64), np.int32)
        for by in range(bh):
            for bx in range(bw):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                q = np.round(_fdct(block) / qt).astype(np.int64)
                zz[by, bx] = q.flat[ZIGZAG]
        zz_all.append(zz)

    # comp geometry for the REAL (non-padded) AC grids
    real = []
    for hf, vf in factors:
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        real.append((-(-ch // 8), -(-cw // 8)))

    # ops per scan: ("sym", kind, tid, symbol) | ("bits", value, n)
    def lowbits(v: int, s: int) -> int:
        return v if v >= 0 else v + (1 << s) - 1

    scans = []  # (header bytes ingredients, ops)

    # scan 1: DC first, interleaved, Al=1
    ops: list = []
    preds = [0] * n_comp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hf, vf) in enumerate(factors):
                for by in range(vf):
                    for bx in range(hf):
                        v = int(zz_all[ci][my * vf + by, mx * hf + bx, 0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        ops.append(("sym", "dc", tsel[ci], s))
                        if s:
                            ops.append(("bits", lowbits(diff, s), s))
    scans.append((list(range(n_comp)), 0, 0, 0, 1, ops))

    # scans 2..: AC first per component, two bands, Al=1
    bands = [(1, 5), (6, 63)]
    for ci in range(n_comp):
        bh, bw = real[ci]
        for ss, se in bands:
            ops = []
            for by in range(bh):
                for bx in range(bw):
                    blk = zz_all[ci][by, bx]
                    t = [
                        (1 if blk[k] >= 0 else -1) * (abs(int(blk[k])) >> 1)
                        for k in range(ss, se + 1)
                    ]
                    run = 0
                    last_nz = max(
                        (i for i, v in enumerate(t) if v), default=-1
                    )
                    for i, v in enumerate(t):
                        if i > last_nz:
                            break
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ops.append(("sym", "ac", tsel[ci], 0xF0))
                            run -= 16
                        s = _category(v)
                        ops.append(("sym", "ac", tsel[ci], (run << 4) | s))
                        ops.append(("bits", lowbits(v, s), s))
                        run = 0
                    if last_nz < len(t) - 1:
                        ops.append(("sym", "ac", tsel[ci], 0x00))  # EOB run 1
            scans.append(([ci], ss, se, 0, 1, ops))

    # DC refinement: raw bit per block, interleaved (no Huffman)
    ops = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hf, vf) in enumerate(factors):
                for by in range(vf):
                    for bx in range(hf):
                        dc = int(zz_all[ci][my * vf + by, mx * hf + bx, 0])
                        ops.append(("bits", dc & 1, 1))
    scans.append((list(range(n_comp)), 0, 0, 1, 0, ops))

    # AC refinement per component/band (T.81 G.1.2.3 encoder mirror)
    for ci in range(n_comp):
        bh, bw = real[ci]
        for ss, se in bands:
            ops = []
            for by in range(bh):
                for bx in range(bw):
                    blk = zz_all[ci][by, bx]
                    run = 0
                    pend: list[int] = []  # correction bits inside the run
                    for k in range(ss, se + 1):
                        a = abs(int(blk[k]))
                        if a == 0:
                            run += 1
                            continue
                        # reaching ANY nonzero flushes due ZRLs first
                        # (libjpeg ordering: decoder walks correction
                        # bits position-interleaved with the zero run)
                        while run > 15:
                            ops.append(("sym", "ac", tsel[ci], 0xF0))
                            ops.extend(("bits", b, 1) for b in pend)
                            pend = []
                            run -= 16
                        if a >= 2:  # already significant: correction bit
                            pend.append(a & 1)
                            continue
                        # newly significant (|v| == 1 at this precision)
                        ops.append(("sym", "ac", tsel[ci], (run << 4) | 1))
                        ops.append(("bits", 1 if blk[k] > 0 else 0, 1))
                        ops.extend(("bits", b, 1) for b in pend)
                        pend = []
                        run = 0
                    if run > 0 or pend:
                        ops.append(("sym", "ac", tsel[ci], 0x00))  # EOB
                        ops.extend(("bits", b, 1) for b in pend)
            scans.append(([ci], ss, se, 1, 0, ops))

    # build flat Huffman tables from all scans' symbols
    by_table: dict[tuple[str, int], list[int]] = {}
    for _, _, _, _, _, ops in scans:
        for op in ops:
            if op[0] == "sym":
                by_table.setdefault((op[1], op[2]), []).append(op[3])
    tables = {key: _flat_table(syms or [0]) for key, syms in by_table.items()}

    # emit markers
    out = bytearray(b"\xff\xd8")
    qt_zz = bytes(int(qt.flat[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt_zz
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci, (hf, vf) in enumerate(factors):
        sof += struct.pack(">BBB", ci + 1, (hf << 4) | vf, 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for (kind, tid), (counts, syms, _enc) in sorted(tables.items()):
        cls = 0 if kind == "dc" else 1
        body = bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    for comp_idx, ss, se, ah, al, ops in scans:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        wr = _BitWriter()
        for op in ops:
            if op[0] == "sym":
                _, kind, tid, sym = op
                ln, code = tables[(kind, tid)][2][sym]
                wr.write(code, ln)
            else:
                _, v, n = op
                if n:
                    wr.write(v, n)
        wr.pad_to_byte()
        out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


def _subsample2(p: np.ndarray) -> np.ndarray:
    h, w = p.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[-1:, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_pixels(content: bytes) -> tuple[int, int, np.ndarray]:
    """Full decode → (width, height, pixels[h, w, channels] uint8)."""
    if content[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    coeffs: list[np.ndarray] | None = None  # SOF2: zigzag coefs per comp
    dc_preds: list[int] = []
    while True:
        if pos + 2 > len(content):
            raise JpegError("truncated marker stream")
        if content[pos] != 0xFF:
            raise JpegError("marker sync lost")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coeffs is not None:
                return _reconstruct_progressive(frame, coeffs, qtables)
            raise JpegError("EOI before SOS")
        if marker in (0xC1, 0xC3):
            raise JpegError("only baseline (SOF0) / progressive (SOF2) supported")
        if marker == 0xC9 or marker == 0xCB:
            raise JpegError("arithmetic coding not supported")
        if pos + 2 > len(content):
            raise JpegError("truncated marker stream")
        seglen = struct.unpack_from(">H", content, pos)[0]
        body = content[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        pos += seglen
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq != 0:
                    raise JpegError("16-bit quant tables not supported")
                if bp + 64 > len(body):
                    raise JpegError("truncated DQT")
                qt = np.zeros(64)
                for i in range(64):
                    qt[ZIGZAG[i]] = body[bp + i]
                qtables[tq] = qt.reshape(8, 8)
                bp += 64
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                cls, tid = body[bp] >> 4, body[bp] & 0x0F
                counts = list(body[bp + 1 : bp + 17])
                n = sum(counts)
                syms = list(body[bp + 17 : bp + 17 + n])
                if len(syms) != n:
                    raise JpegError("truncated DHT")
                htables[(cls, tid)] = _canonical_codes(counts, syms)
                bp += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            if h == 0 or w == 0 or nc == 0:
                raise JpegError("zero dimension")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise JpegError("sampling factors beyond 2x2")
                comps.append({"id": cid, "h": hf, "v": vf, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            progressive = marker == 0xC2
            if progressive:
                _, _, mcus_x, mcus_y, _geo = _comp_geometry(frame)
                coeffs = [
                    np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
                    for c in comps
                ]
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            if not body:
                raise JpegError("empty SOS")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise JpegError("truncated SOS header")
            known = {c["id"] for c in frame["comps"]}
            scan_sel = {}
            scan_comps = []
            for i in range(ns):
                cid, tsel = body[1 + 2 * i], body[2 + 2 * i]
                if cid not in known:
                    raise JpegError(f"scan references unknown component {cid}")
                scan_sel[cid] = (tsel >> 4, tsel & 0x0F)
                scan_comps.append(cid)
            if not progressive:
                if known - set(scan_comps):
                    raise JpegError("sequential scan must cover all components")
                return _decode_scan(
                    content, pos, frame, scan_sel, qtables, htables,
                    restart_interval,
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pos = _decode_progressive_scan(
                content, pos, frame, coeffs,
                scan_comps, scan_sel, ss, se, ahal >> 4, ahal & 0x0F,
                htables, restart_interval,
            )
        # else: APPn / COM / unknown — skipped


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan_sel: dict,
    qtables: dict,
    htables: dict,
    restart_interval: int,
) -> tuple[int, int, np.ndarray]:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                reader.align_and_expect_rst(rst_n)
                rst_n += 1
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                dch = htables.get((0, dc_t))
                ach = htables.get((1, ac_t))
                if dch is None or ach is None:
                    raise JpegError("scan references missing DHT")
                qt = qtables.get(c["tq"])
                if qt is None:
                    raise JpegError("scan references missing DQT")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        s = _huff_decode(reader, dch)
                        diff = _extend(reader.read(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ach)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise JpegError("bad AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise JpegError("AC index overflow")
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        coef = np.zeros(64)
                        for i in range(64):
                            coef[ZIGZAG[i]] = zz[i]
                        block = _idct(coef.reshape(8, 8) * qt) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample to full grid, crop, color-convert
    full = []
    for p, c in zip(planes, comps):
        rh, rw = vmax // c["v"], hmax // c["h"]
        up = np.repeat(np.repeat(p, rh, axis=0), rw, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, px[..., None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
    return w, h, px


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 Annex G.1.2/G.2
# ---------------------------------------------------------------------------


def _comp_geometry(frame: dict):
    """(hmax, vmax, mcus_x, mcus_y, per-comp {bw, bh, bw_pad, bh_pad}).
    ``bw/bh`` are the REAL block counts a non-interleaved scan covers
    (ceil of the component's own sample dimensions / 8); ``*_pad`` is
    the MCU-padded grid interleaved scans traverse."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    geo = []
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        geo.append(
            {
                "bw": -(-cw // 8),
                "bh": -(-ch // 8),
                "bw_pad": mcus_x * c["h"],
                "bh_pad": mcus_y * c["v"],
            }
        )
    return hmax, vmax, mcus_x, mcus_y, geo


def _next_marker(data: bytes, pos: int) -> int:
    """Advance past entropy padding to the next real marker."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    raise JpegError("no marker after scan data")


def _refine_ac(blk: np.ndarray, reader: _BitReader, ac_t: dict,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement for one block's band
    (T.81 G.1.2.3): newly-significant coefficients arrive as run/1
    symbols with a sign bit; every already-nonzero coefficient crossed
    contributes one correction bit; EOB runs carry correction bits for
    the rest of the band. Returns the updated EOB run."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_decode(reader, ac_t)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise JpegError("AC refinement size must be 1")
                newval = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read(r)
                break  # correction tail handled below
            # advance over r still-zero coefs + any nonzero (correction bits)
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _first_ac(blk: np.ndarray, reader: _BitReader, ac_t: dict,
              ss: int, se: int, al: int, eobrun: int) -> int:
    """AC first pass for one block's band (T.81 G.1.2.2). Returns the
    updated EOB run (blocks remaining to skip AFTER this one)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_decode(reader, ac_t)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read(r)
            break
        k += r
        if k > se:
            raise JpegError("AC index beyond spectral band")
        blk[k] = _extend(reader.read(s), s) << al
        k += 1
    return eobrun


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame: dict,
    coeffs: list,
    scan_comps: list,
    scan_sel: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    htables: dict,
    restart_interval: int,
) -> int:
    """Decode one progressive scan into the per-component zigzag
    coefficient buffers; return the stream position of the next marker.

    DC scans (Ss=0) may interleave several components (MCU traversal
    over the padded grid); AC scans are single-component over the REAL
    block grid. Restart markers reset DC predictors and the EOB run.
    """
    comps = frame["comps"]
    idx = {c["id"]: i for i, c in enumerate(comps)}
    _, _, mcus_x, mcus_y, geo = _comp_geometry(frame)
    reader = _BitReader(data, pos)
    rst_n = 0
    unit_count = 0
    eobrun = 0
    preds = {cid: 0 for cid in scan_comps}

    def maybe_restart():
        nonlocal rst_n, eobrun, preds
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            reader.align_and_expect_rst(rst_n)
            rst_n += 1
            eobrun = 0
            preds = {cid: 0 for cid in scan_comps}

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise JpegError("DC scan must have Se=0")
        members = [idx[cid] for cid in scan_comps]
        if len(scan_comps) > 1:  # interleaved: padded MCU traversal
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    unit_count += 1
                    for ci in members:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coeffs[ci][my * c["v"] + by, mx * c["h"] + bx]
                                _dc_pass(blk, reader, htables, scan_sel, c,
                                         ah, al, preds)
        else:
            ci = members[0]
            c = comps[ci]
            g = geo[ci]
            for by in range(g["bh"]):
                for bx in range(g["bw"]):
                    maybe_restart()
                    unit_count += 1
                    _dc_pass(coeffs[ci][by, bx], reader, htables, scan_sel, c,
                             ah, al, preds)
    else:  # AC scan: single component, real block grid
        if len(scan_comps) != 1:
            raise JpegError("AC progressive scan must be non-interleaved")
        if not 1 <= ss <= se <= 63:
            raise JpegError("bad spectral band")
        ci = idx[scan_comps[0]]
        ac_t = htables.get((1, scan_sel[scan_comps[0]][1]))
        if ac_t is None:
            raise JpegError("scan references missing DHT")
        fn = _refine_ac if ah else _first_ac
        g = geo[ci]
        for by in range(g["bh"]):
            for bx in range(g["bw"]):
                maybe_restart()
                unit_count += 1
                eobrun = fn(coeffs[ci][by, bx], reader, ac_t, ss, se, al, eobrun)
    return _next_marker(data, reader.pos)


def _dc_pass(blk, reader, htables, scan_sel, c, ah, al, preds):
    if ah == 0:  # first pass: Huffman-coded diff, shifted by Al
        dc_t = htables.get((0, scan_sel[c["id"]][0]))
        if dc_t is None:
            raise JpegError("scan references missing DHT")
        s = _huff_decode(reader, dc_t)
        if s > 15:
            raise JpegError("DC category out of range")
        diff = _extend(reader.read(s), s) if s else 0
        preds[c["id"]] += diff
        if abs(preds[c["id"]]) > 1 << 28:  # int32-safe typed error
            raise JpegError("DC predictor out of range")
        blk[0] = preds[c["id"]] << al
    else:  # refinement: one raw bit per block
        if reader.read_bit():
            blk[0] = int(blk[0]) | (1 << al)


def _reconstruct_progressive(
    frame: dict, coeffs: list, qtables: dict
) -> tuple[int, int, np.ndarray]:
    """Dequantize + IDCT the accumulated coefficient buffers, then
    upsample/crop/color-convert exactly like the baseline path."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _, _geo = _comp_geometry(frame)
    planes = []
    for c, zz in zip(comps, coeffs):
        qt = qtables.get(c["tq"])
        if qt is None:
            raise JpegError("frame references missing DQT")
        bh, bw = zz.shape[:2]
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[..., ZIGZAG] = zz  # zigzag -> natural order
        blocks = nat.reshape(bh, bw, 8, 8) * qt
        spatial = np.einsum("ij,xyjk,kl->xyil", _C.T, blocks, _C) + 128.0
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    full = []
    for p, c in zip(planes, comps):
        rh, rw = vmax // c["v"], hmax // c["h"]
        up = np.repeat(np.repeat(p, rh, axis=0), rw, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, px[..., None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
    return w, h, px


def decode_jpeg(content: bytes) -> dict:
    """Stats dict matching the other image decoders."""
    w, h, px = decode_jpeg_pixels(content)
    return {
        "width": w,
        "height": h,
        "channels": px.shape[-1],
        "mean_lum": round(float(px.mean()), 6),
    }
