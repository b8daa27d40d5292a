"""Baseline JPEG codec in pure numpy + stdlib — no external image libs.

Scope (ITU T.81 baseline sequential DCT, 8-bit):
- ``encode_jpeg``: grayscale or RGB, 4:4:4 or 4:2:0 (``subsample=True``),
  optional restart markers, per-image optimal Huffman tables (two-pass,
  emitted in DHT — no dependence on the Annex K example tables).
- ``decode_jpeg``: any baseline file — arbitrary sampling factors,
  multiple DQT/DHT segments, 16-bit quant precision, restart markers.
  Progressive (SOF2) and arithmetic-coded files raise
  ``MediaFormatError`` — honestly out of scope, not silently wrong.

Entropy coding is per-symbol Python (JPEG Huffman is inherently
sequential); everything block-shaped (DCT/IDCT, quantization, level
shift, chroma up/downsampling, color transforms) is vectorized numpy
over all blocks at once. Decode runs inside the MediaDecoder actor
pool, so per-image Python cost parallelizes across workers.

Parity note: the reference repo has no media pipeline; this implements
the multimodal-column decode step the 100-TB engine needs (see
``stages/multimodal.py``).
"""

from __future__ import annotations

import struct

import numpy as np

from nlshray.functions.media import MediaFormatError

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Natural-order index for each zigzag position (T.81 figure 5)."""
    order = np.empty(64, dtype=np.int64)
    r = c = 0
    up = True
    for i in range(64):
        order[i] = r * 8 + c
        if up:
            if c == 7:
                r += 1
                up = False
            elif r == 0:
                c += 1
                up = False
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
                up = True
            elif c == 0:
                r += 1
                up = True
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _zigzag_order()  # zigzag position -> natural position
UNZIGZAG = np.argsort(ZIGZAG)  # natural position -> zigzag position

# Annex K example quantization tables (the one table set everyone uses)
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-convention quality scaling of the Annex K tables."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = np.floor((base * s + 50) / 100)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_DCT = _dct_matrix()


def _blocks_dct(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT over (n, 8, 8) blocks at once."""
    return np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT, optimize=True)


def _blocks_idct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT, optimize=True)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _code_lengths(freq: dict[int, int]) -> dict[int, int]:
    """Huffman code length per symbol, deterministic tie-breaks. A
    reserved pseudo-symbol (-1, freq 1) keeps the all-ones code unused
    (T.81 K.2 convention)."""
    import heapq

    heap = [(f, (s,), s) for s, f in freq.items() if f > 0]
    heap.append((1, (-1,), -1))
    heapq.heapify(heap)
    depth = {s: 0 for _, syms, _ in heap for s in syms}
    while len(heap) > 1:
        f1, s1, t1 = heapq.heappop(heap)
        f2, s2, t2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2, min(t1, t2)))
    return depth


def _huff_spec(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """(bits[1..16], values) for a DHT segment: canonical lengths,
    adjusted to the 16-bit JPEG limit (T.81 K.3 Adjust_BITS)."""
    depth = _code_lengths(freq)
    maxlen = max(depth.values())
    bits = [0] * (max(maxlen, 16) + 2)
    for s, d in depth.items():
        bits[d] += 1
    for ln in range(len(bits) - 1, 16, -1):
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j] -= 1
            bits[j + 1] += 2
    # drop the reserved symbol from the longest populated length
    for ln in range(16, 0, -1):
        if bits[ln] > 0:
            bits[ln] -= 1
            break
    real = sorted((s for s in depth if s >= 0), key=lambda s: (depth[s], s))
    assert sum(bits[1:17]) == len(real)
    return bits[1:17], real


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code), canonical order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    return {lc: s for s, lc in _huff_codes(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


class _BitReader:
    """Bit reader over one destuffed entropy segment."""

    def __init__(self, seg: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(seg, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise MediaFormatError("jpeg: truncated entropy data")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise MediaFormatError("jpeg: invalid Huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantize_plane(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) zigzag-ordered quantized coefficients."""
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coefs = _blocks_dct(blocks) / qt[None, :, :]
    return np.rint(coefs).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]


def _block_symbols(zz: np.ndarray, dc_pred: int) -> tuple[list, list, int]:
    """(dc_syms, ac_syms, new_pred): symbols + appended magnitude bits as
    (symbol, size, amplitude) triples for one block."""
    diff = int(zz[0]) - dc_pred
    s = _category(diff)
    dc = [(s, s, diff if diff >= 0 else diff + (1 << s) - 1)]
    ac = []
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(v)
        ac.append(((run << 4) | s, s, v if v >= 0 else v + (1 << s) - 1))
        run = 0
    if last < 63:
        ac.append((0x00, 0, 0))  # EOB
    return dc, ac, int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 to baseline JPEG."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise MediaFormatError("encode_jpeg expects uint8 HxW or HxWx3")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l, qt_c = _quant_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qts = [qt_l]
        qt_ids = [0]
    else:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # 4:2:0 — chroma is the 2x2 block mean of the edge-padded plane
            cbp = _pad_edge(cb, 2)
            crp = _pad_edge(cr, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]
        qt_ids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # quantize each component; record its block-grid width for MCU order
    comp_zz: list[np.ndarray] = []
    comp_bw: list[int] = []
    for plane, (sh, sv), qt in zip(planes, samp, qts):
        # pad so the component's block grid covers whole MCUs
        need_h = -(-h // (8 * vmax)) * sv * 8
        need_w = -(-w // (8 * hmax)) * sh * 8
        ph = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        comp_zz.append(_quantize_plane(ph, qt))
        comp_bw.append(need_w // 8)

    mcu_rows = -(-h // (8 * vmax))
    mcu_cols = -(-w // (8 * hmax))

    def mcu_blocks():
        """Yield (comp_index, block_index) in interleaved scan order,
        with a None sentinel at each restart boundary."""
        n = 0
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                if restart_interval and n and n % restart_interval == 0:
                    yield None
                n += 1
                for ci, (sh, sv) in enumerate(samp):
                    for v in range(sv):
                        for hh in range(sh):
                            yield ci, (my * sv + v) * comp_bw[ci] + mx * sh + hh

    # pass 1: symbol frequencies (luma tables = component 0, chroma = rest)
    n_tables = 1 if gray else 2
    dc_freq = [dict() for _ in range(n_tables)]
    ac_freq = [dict() for _ in range(n_tables)]
    preds = [0] * len(planes)
    for item in mcu_blocks():
        if item is None:
            preds = [0] * len(planes)
            continue
        ci, bi = item
        ti = 0 if ci == 0 else 1
        dc, ac, preds[ci] = _block_symbols(comp_zz[ci][bi], preds[ci])
        for sym, _, _ in dc:
            dc_freq[ti][sym] = dc_freq[ti].get(sym, 0) + 1
        for sym, _, _ in ac:
            ac_freq[ti][sym] = ac_freq[ti].get(sym, 0) + 1

    dc_specs = [_huff_spec(f) for f in dc_freq]
    ac_specs = [_huff_spec(f) for f in ac_freq]
    dc_codes = [_huff_codes(*s) for s in dc_specs]
    ac_codes = [_huff_codes(*s) for s in ac_specs]

    # pass 2: entropy-coded data
    out = bytearray()
    wtr = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for item in mcu_blocks():
        if item is None:
            wtr.flush()
            out += wtr.buf
            wtr = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(planes)
            continue
        ci, bi = item
        ti = 0 if ci == 0 else 1
        dc, ac, preds[ci] = _block_symbols(comp_zz[ci][bi], preds[ci])
        for sym, size, amp in dc:
            ln, code = dc_codes[ti][sym]
            wtr.put(code, ln)
            if size:
                wtr.put(amp, size)
        for sym, size, amp in ac:
            ln, code = ac_codes[ti][sym]
            wtr.put(code, ln)
            if size:
                wtr.put(amp, size)
    wtr.flush()
    out += wtr.buf

    # headers
    head = bytearray(b"\xff\xd8")  # SOI
    head += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate([qt_l] if gray else [qt_l, qt_c]):
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8)
        head += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()
    ncomp = len(planes)
    head += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        head += struct.pack(
            "BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], qt_ids[ci]
        )
    for cls, specs in ((0, dc_specs), (1, ac_specs)):
        for tid, (bits, values) in enumerate(specs):
            head += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), (cls << 4) | tid)
            head += bytes(bits) + bytes(values)
    if restart_interval:
        head += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    head += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        head += struct.pack("BB", ci + 1, (ti << 4) | ti)
    head += b"\x00\x3f\x00"
    return bytes(head) + bytes(out) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 HxW (1 component) or HxWx3 (RGB)."""
    if data[:2] != b"\xff\xd8":
        raise MediaFormatError("jpeg: missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise MediaFormatError("jpeg: bad marker sync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                nat = np.empty(64)
                nat[ZIGZAG] = vals
                qtabs[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nval = sum(bits)
                values = list(seg[i + 17 : i + 17 + nval])
                htabs[(cls, tid)] = _huff_decode_map(bits, values)
                i += 17 + nval
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise MediaFormatError("jpeg: only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaFormatError(
                "jpeg: progressive/arithmetic/hierarchical modes not supported"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise MediaFormatError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid, tdta = seg[1 + 2 * si : 3 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            # entropy data runs from pos until the next real marker
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            ecs = data[pos:end]
            pos = end
            return _decode_scan(frame, scan, qtabs, htabs, ecs, restart_interval)
    raise MediaFormatError("jpeg: no scan data")


def _decode_scan(frame, scan, qtabs, htabs, ecs: bytes, ri: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcu_rows = -(-h // (8 * vmax))
    mcu_cols = -(-w // (8 * hmax))
    n_mcus = mcu_rows * mcu_cols

    # split at restart markers, destuff each segment
    segments = []
    cur = bytearray()
    i = 0
    while i < len(ecs):
        b = ecs[i]
        if b == 0xFF:
            nxt = ecs[i + 1] if i + 1 < len(ecs) else 0
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    comp_state = []
    for comp, td, ta in scan:
        bw = mcu_cols * comp["h"]
        bh = mcu_rows * comp["v"]
        comp_state.append(
            {
                "comp": comp,
                "dc": None,  # filled per segment
                "td": td,
                "ta": ta,
                "zz": np.zeros((bh * bw, 64), dtype=np.float64),
                "bw": bw,
            }
        )

    mcu = 0
    for seg_i, seg in enumerate(segments):
        rdr = _BitReader(seg)
        preds = [0] * len(scan)
        seg_mcus = ri if (ri and seg_i < len(segments) - 1) else n_mcus - mcu
        for _ in range(seg_mcus):
            if mcu >= n_mcus:
                break
            my, mx = divmod(mcu, mcu_cols)
            for si, st in enumerate(comp_state):
                comp = st["comp"]
                dc_tab = _get_htab(htabs, st["td"], 0)
                ac_tab = _get_htab(htabs, st["ta"], 1)
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        bi = (my * comp["v"] + v) * st["bw"] + mx * comp["h"] + hh
                        preds[si] = _decode_block(
                            rdr, st["zz"][bi], dc_tab, ac_tab, preds[si]
                        )
            mcu += 1
    if mcu < n_mcus:
        raise MediaFormatError("jpeg: truncated scan")

    planes = []
    for st in comp_state:
        comp = st["comp"]
        qt = qtabs.get(comp["tq"])
        if qt is None:
            raise MediaFormatError("jpeg: missing quantization table")
        nat = np.zeros_like(st["zz"])
        nat[:, ZIGZAG] = st["zz"]
        blocks = _blocks_idct((nat * qt.reshape(64)[None, :]).reshape(-1, 8, 8))
        bw = st["bw"]
        bh = len(blocks) // bw
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        plane = np.clip(plane + 128.0, 0, 255)
        # upsample to full-resolution grid by sample replication
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.rint(planes[0]).astype(np.uint8)
    if len(planes) == 3:
        return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    raise MediaFormatError(f"jpeg: unsupported component count {len(planes)}")


def _get_htab(htabs, tid: int, cls: int):
    tab = htabs.get((cls, tid))
    if tab is None:
        raise MediaFormatError("jpeg: missing Huffman table")
    return tab


def _decode_block(rdr: _BitReader, zz: np.ndarray, dc_tab, ac_tab, pred: int) -> int:
    s = rdr.decode_symbol(dc_tab)
    diff = _extend(rdr.get_bits(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = rdr.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise MediaFormatError("jpeg: AC index overflow")
        zz[k] = _extend(rdr.get_bits(s), s)
        k += 1
    return pred
