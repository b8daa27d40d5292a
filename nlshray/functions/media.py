"""Pure-numpy media codecs + feature kernels (no external libraries).

The multimodal stage treats image/audio as opaque ``binary`` columns;
these are REAL decoders for the container formats that need no codec
library — WAV (PCM 8/16-bit), BMP (uncompressed 24/32-bit BI_RGB),
PPM/PGM (binary P5/P6) and PNG (8-bit gray/RGB/RGBA/palette,
non-interlaced — zlib inflate is in the standard library, so PNG
needs no external codec) and GIF (LZW is a plain dictionary coder —
pure Python here) — plus the transform kernels a training-data
pipeline runs on the decoded arrays: nearest-neighbor resize, audio
frame sampling / RMS features, channel statistics. Formats whose
entropy coders are NOT in the stdlib (jpeg/mp3/webm) still require a
library and stay stubbed in ``nlshray.stages.multimodal``.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaFormatError(ValueError):
    pass


# --------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM integer)
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float32 [-1,1] mono -> 16-bit PCM WAV bytes (test/fixture helper)."""
    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    data = pcm16.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float32 mono samples in [-1,1], sample_rate).

    Multi-channel input is mean-downmixed. 8-bit (unsigned) and 16-bit
    (signed little-endian) PCM only — the formats a header-only parser
    can decode exactly.
    """
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _bps, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise MediaFormatError(f"non-PCM wav (fmt={audio_fmt})")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)   # chunks are 2-byte aligned
    if fmt is None or samples is None:
        raise MediaFormatError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    if bits == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(samples, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise MediaFormatError(f"unsupported bit depth {bits}")
    if n_ch > 1:
        arr = arr[: len(arr) - len(arr) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return arr.astype(np.float32), rate


# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed 24/32-bit)
# --------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (fixture helper)."""
    img = np.asarray(img, np.uint8)
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):          # bottom-up rows
        bgr = img[r, :, ::-1].tobytes()
        body += bgr + b"\x00" * pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Uncompressed 24/32-bit only."""
    if len(data) < 54 or data[:2] != b"BM":
        raise MediaFormatError("not a BMP payload")
    off = struct.unpack("<I", data[10:14])[0]
    hsz, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if comp != 0 or bpp not in (24, 32):
        raise MediaFormatError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    step = bpp // 8
    row_bytes = (w * step + 3) & ~3
    px = np.frombuffer(data, np.uint8, count=row_bytes * h, offset=off)
    px = px.reshape(h, row_bytes)[:, : w * step].reshape(h, w, step)
    rgb = px[:, :, 2::-1]                     # BGR(A) -> RGB
    return (rgb[::-1] if flip else rgb).copy()


# --------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5)
# --------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, np.uint8)
    h, w, _ = img.shape
    return f"P6 {w} {h} 255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm -> uint8 array (h,w,3)/(h,w)."""
    if data[:2] not in (b"P5", b"P6"):
        raise MediaFormatError("not a binary netpbm payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
    pos += 1                                   # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise MediaFormatError("16-bit netpbm unsupported")
    ch = 3 if data[:2] == b"P6" else 1
    px = np.frombuffer(data, np.uint8, count=w * h * ch, offset=pos)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


# --------------------------------------------------------------------------
# transform kernels over decoded arrays
# --------------------------------------------------------------------------

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure indexing — deterministic)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri][:, ci]


def frame_sample(samples: np.ndarray, n_frames: int) -> np.ndarray:
    """Evenly spaced sample/frame selection (video frame-sampling shape)."""
    n = samples.shape[0]
    if n == 0:
        return samples[:0]
    idx = (np.arange(n_frames) * n // n_frames).clip(0, n - 1)
    return samples[idx]


def audio_features(samples: np.ndarray, n_windows: int = 8) -> np.ndarray:
    """Per-window RMS energy features, float32 (n_windows,)."""
    n = samples.shape[0]
    if n == 0:
        return np.zeros(n_windows, np.float32)
    edges = (np.arange(n_windows + 1) * n // n_windows).clip(0, n)
    sq = np.concatenate([[0.0], np.cumsum(samples.astype(np.float64) ** 2)])
    cnt = np.maximum(edges[1:] - edges[:-1], 1)
    return np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / cnt).astype(np.float32)


def image_features(img: np.ndarray, bins: int = 8) -> np.ndarray:
    """Normalized intensity histogram + mean/std, float32 (bins+2,)."""
    flat = np.asarray(img, np.float64).reshape(-1)
    hist = np.bincount(
        (flat * bins / 256.0).astype(np.int64).clip(0, bins - 1),
        minlength=bins,
    ).astype(np.float64)
    hist /= max(flat.shape[0], 1)
    return np.concatenate(
        [hist, [flat.mean() / 255.0 if flat.size else 0.0,
                flat.std() / 255.0 if flat.size else 0.0]]
    ).astype(np.float32)


# --------------------------------------------------------------------------
# PNG (true decoder — zlib is in the Python standard library, so PNG
# needs no external codec: chunk walk, zlib inflate, per-row unfilter).
# Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
# 6 (RGBA), non-interlaced. Anything else raises MediaFormatError —
# honest refusal, not a wrong answer.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8 image (H,W) gray / (H,W,3) RGB / (H,W,4) RGBA -> PNG bytes.
    ``filter_type`` applies one PNG filter to every row (0..4) — the
    test fixture knob that exercises each unfilter path."""
    import zlib

    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
        px = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        ch = img.shape[2]
        color = 2 if ch == 3 else 6
        px = img
    else:
        raise MediaFormatError(f"unsupported image shape {img.shape}")
    h, w = px.shape[:2]
    raw = px.reshape(h, w * ch).astype(np.int64)
    prev = np.zeros(w * ch, np.int64)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        upl = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - (left + prev) // 2
        elif filter_type == 4:
            f = cur - _paeth(left, prev, upl)
        else:
            raise MediaFormatError(f"bad filter {filter_type}")
        lines.append(bytes([filter_type]) + (f % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        import zlib as z

        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", z.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    p = left + up - upleft
    pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    out = np.where(pa_ <= np.minimum(pb, pc), left, np.where(pb <= pc, up, upleft))
    return out


def _decode_png_impl(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) gray or (H,W,C) RGB/RGBA.

    Unfilter vectorization: None/Up are whole-row ops; Sub is an exact
    per-channel cumsum mod 256; Average/Paeth carry a nonlinear
    left-pixel dependency, so those rows run a per-pixel loop (bounded
    by image width — decode parallelism comes from the actor pool,
    one image per element, not from within a row)."""
    import zlib

    if not data.startswith(_PNG_SIG):
        raise MediaFormatError("not a PNG")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, [], None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        crc = data[pos + 8 + ln : pos + 12 + ln]
        if len(body) != ln or len(crc) != 4:
            raise MediaFormatError("truncated PNG chunk")
        if struct.unpack(">I", crc)[0] != (zlib.crc32(typ + body) & 0xFFFFFFFF):
            raise MediaFormatError(f"PNG crc mismatch in {typ!r}")
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise MediaFormatError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise MediaFormatError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 3: 1, 6: 4}.get(color)
    if ch is None:
        raise MediaFormatError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise MediaFormatError("PNG scanline payload has the wrong size")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes, lines = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f, cur = int(ftypes[y]), lines[y]
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: cumsum mod 256 per channel lane
            rec = cur.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f in (3, 4):  # Average/Paeth: sequential left dependency
            rec = np.empty(stride, np.int64)
            px = cur.reshape(w, ch)
            pv = prev.reshape(w, ch)
            r = rec.reshape(w, ch)
            left = np.zeros(ch, np.int64)
            upleft = np.zeros(ch, np.int64)
            for x in range(w):
                if f == 3:
                    r[x] = (px[x] + (left + pv[x]) // 2) % 256
                else:
                    r[x] = (px[x] + _paeth(left, pv[x], upleft)) % 256
                left, upleft = r[x], pv[x]
            rec = r.reshape(stride)
        else:
            raise MediaFormatError(f"bad PNG filter {f}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, ch)
    if color == 3:
        if plte is None or len(plte) % 3:
            raise MediaFormatError("paletted PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise MediaFormatError("PNG palette index out of range")
        return pal[idx]
    return img[:, :, 0] if ch == 1 else img


# --------------------------------------------------------------------------
# GIF (true decoder — LZW is a plain dictionary coder, implementable
# without any codec library). Supported: GIF87a/89a, global or local
# color table, interlace, first frame of an animation (training
# pipelines treat later frames as frame_sample territory). The LZW
# inner loop is per-code Python — GIF decode parallelism comes from
# the actor pool (one image per element), and the honest cost note
# lives here rather than a fake vectorization claim.
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    dict_init = [(i,) for i in range(clear)] + [(), ()]
    table = list(dict_init)
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # stream ended without END code: accept
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(dict_init)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise MediaFormatError("corrupt GIF LZW stream")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    bits: list[tuple[int, int]] = [(clear, width)]
    run: tuple[int, ...] = ()
    for sym in indices:
        cand = run + (sym,)
        if cand in table:
            run = cand
            continue
        bits.append((table[run], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            bits.append((clear, width))
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (sym,)
    if run:
        bits.append((table[run], width))
    bits.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(img: np.ndarray, *, interlace: bool = False) -> bytes:
    """uint8 (H,W,3) RGB (<=256 distinct colors) or (H,W) gray -> GIF89a
    bytes with real LZW compression (test/fixture helper)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if pal.shape[0] > 256:
        raise MediaFormatError("encode_gif: more than 256 distinct colors")
    size_bits = max(int(np.ceil(np.log2(max(pal.shape[0], 2)))), 1)
    table_n = 1 << size_bits
    pal_bytes = np.zeros((table_n, 3), np.uint8)
    pal_bytes[: pal.shape[0]] = pal
    idx = inv.reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(s, h, step) for s, step in _GIF_INTERLACE_PASSES]
        )
        idx = idx[order]
    min_code = max(2, size_bits)
    lzw = _lzw_encode(idx.reshape(-1).tolist(), min_code)
    subs = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    packed = 0x80 | (size_bits - 1)  # global table flag + size
    img_packed = 0x40 if interlace else 0
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, packed, 0, 0)
        + pal_bytes.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, img_packed)
        + bytes([min_code])
        + subs
        + b"\x00\x3b"
    )


def _decode_gif_impl(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (H,W,3) RGB (first frame)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaFormatError("not a GIF")
    if len(data) < 13:
        raise MediaFormatError("truncated GIF header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gpal = None
    if packed & 0x80:
        n = 3 * (1 << ((packed & 0x07) + 1))
        gpal = np.frombuffer(data[pos : pos + n], np.uint8).reshape(-1, 3)
        pos += n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise MediaFormatError(f"unexpected GIF block 0x{b0:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        pal = gpal
        if ipacked & 0x80:
            n = 3 * (1 << ((ipacked & 0x07) + 1))
            pal = np.frombuffer(data[pos : pos + n], np.uint8).reshape(-1, 3)
            pos += n
        if pal is None:
            raise MediaFormatError("GIF image has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), min_code)
        if len(idx) < w * h:
            raise MediaFormatError("GIF pixel data too short")
        arr = np.asarray(idx[: w * h], np.int64).reshape(h, w)
        if ipacked & 0x40:  # interlaced: invert the pass ordering
            order = np.concatenate(
                [np.arange(s, h, step) for s, step in _GIF_INTERLACE_PASSES]
            )
            back = np.empty(h, np.int64)
            back[order] = np.arange(h)
            arr = arr[back]
        if int(arr.max(initial=0)) >= pal.shape[0]:
            raise MediaFormatError("GIF palette index out of range")
        return pal[arr]
    raise MediaFormatError("GIF contains no image block")


def _format_guard(fn, data: bytes, what: str) -> np.ndarray:
    """Truncated/garbled containers must surface as MediaFormatError —
    the fallback contract MediaDecoder relies on — not as struct.error
    / reshape ValueError / zlib.error from whatever parse step hit the
    end of the buffer first."""
    import zlib

    try:
        return fn(data)
    except MediaFormatError:
        raise
    except (struct.error, ValueError, IndexError, zlib.error) as e:
        raise MediaFormatError(f"malformed {what}: {e}") from e


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array; see ``_decode_png_impl`` for scope."""
    return _format_guard(_decode_png_impl, data, "PNG")


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (H,W,3) RGB; see ``_decode_gif_impl``."""
    return _format_guard(_decode_gif_impl, data, "GIF")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 HxW or (H,W,3) RGB; pure numpy
    (``nlshray.functions.jpeg``). Progressive/arithmetic files raise."""
    from nlshray.functions.jpeg import decode_jpeg as _impl

    return _format_guard(_impl, data, "JPEG")


def encode_jpeg(img: np.ndarray, quality: int = 90, **kwargs) -> bytes:
    """Encode uint8 HxW / HxWx3 to baseline JPEG (fixture/test path)."""
    from nlshray.functions.jpeg import encode_jpeg as _impl

    return _impl(img, quality, **kwargs)
