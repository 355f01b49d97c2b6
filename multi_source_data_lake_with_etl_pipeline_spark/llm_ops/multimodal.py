"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas`` UDFs.

The Spark-side plumbing (schemas, batch iteration, partition-parallel
decode fan-out) is real and tested. Decode itself is REAL for the
formats the standard library + numpy can parse — PPM (P6) images,
PNG across the full spec matrix (grayscale 1-16 bit, palette-
indexed, truecolor, alpha variants, Adam7 interlaced; stdlib zlib
inflate + scanline-filter reconstruction, ``_decode_png``), BASELINE-SEQUENTIAL
JPEG (marker parse + Huffman entropy decode + dequant/iDCT +
YCbCr→RGB, ``_decode_jpeg``; grayscale and 4:4:4/4:2:2/4:2:0 color),
and PCM WAV audio (``_decode_ppm``/``_decode_wav``, dispatched by
payload magic). For MP4 and MP3 the container/frame-header METADATA
is real — ``_probe_mp4`` walks the ISO-BMFF box tree for width/
height/frame-count/duration, ``_probe_mp3`` walks MPEG-1 Layer III
frame headers for sample-rate/duration — while the codec payload
decode itself stays STUBBED (no av libraries in this container):
features fall back to deterministic byte histograms. A PNG/JPEG
outside the supported subset (progressive/arithmetic/CMYK JPEG) or
a corrupt PNG/MP4/MP3 structure rejects LOUDLY
(never a silent fake) and is quarantined per row. Swap the decode
stage for PIL/torchaudio/ffmpeg in a real deployment — the UDF
signature and partitioning strategy do not change.

Scale notes: decode is CPU-heavy per row, so the pattern is
``repartition`` to core-count granularity BEFORE the mapInPandas stage
(decode cost dominates; shuffle of compressed bytes is cheap relative
to decode), then column-prune the binary away as soon as features are
extracted.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema for a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),       # image/video, else null
        T.StructField("height", T.IntegerType()),      # image/video, else null
        T.StructField("n_frames", T.IntegerType()),    # video, else null
        T.StructField("sample_rate", T.IntegerType()), # audio, else null
        T.StructField("duration_s", T.FloatType()),    # audio/video, else null
        T.StructField("feature", T.ArrayType(T.FloatType())),
        # per-row decode failure (corrupt payload, or a real PNG outside
        # the supported 8-bit RGB/RGBA subset): the row is QUARANTINED —
        # metadata nulled, the reason kept loud — instead of one bad
        # asset failing the whole mapInPandas stage at scale
        T.StructField("decode_error", T.StringType()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB codec: deterministic fake decode.

    Real deployment: ``PIL.Image.open(io.BytesIO(payload))`` →
    ``(im.width, im.height, embed(im))``. Here: dimensions derived from
    payload length, feature = 8 normalized byte-histogram buckets —
    deterministic, so tests can assert exact values.
    """
    n = len(payload)
    width, height = (n % 640) + 1, (n % 480) + 1
    if n:
        hist = np.bincount(np.frombuffer(payload, np.uint8) >> 5, minlength=8)
    else:
        hist = np.zeros(8, dtype=np.int64)
    total = max(n, 1)
    return width, height, [round(int(h) / total, 6) for h in hist]


def _decode_ppm(payload: bytes) -> tuple[int, int, list[float]] | None:
    """REAL image decode for binary PPM (P6) — header + raw RGB needs
    only numpy, no codec library. Returns (width, height, feature) or
    None when the payload is not P6 / is malformed (caller falls back
    to the stub). Feature: per-channel means plus a 5-bucket luminance
    histogram, all in [0,1] — 8 floats, same shape as the stub's."""
    if not payload.startswith(b"P6"):
        return None
    try:
        # header = magic, width, height, maxval as whitespace-separated
        # tokens with '#' comments; pixel bytes follow the single
        # whitespace after maxval
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        width, height, maxval = tokens
        if not (0 < width and 0 < height and 0 < maxval < 256):
            return None
        px = np.frombuffer(payload, np.uint8, count=width * height * 3, offset=pos)
        rgb = px.reshape(-1, 3).astype(np.float64) / maxval
        lum = rgb @ np.array([0.299, 0.587, 0.114])
        hist = np.histogram(lum, bins=5, range=(0.0, 1.0 + 1e-9))[0] / len(lum)
        feat = [round(float(v), 6) for v in rgb.mean(axis=0)] + [
            round(float(v), 6) for v in hist
        ]
        return width, height, feat
    except (ValueError, IndexError):
        return None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> tuple[int, int, list[float]] | None:
    """REAL image decode for PNG, dependency-free (stdlib ``zlib``
    inflate + per-scanline filter reconstruction). Subset: every
    spec combination — grayscale (1/2/4/8/16-bit),
    truecolor (8/16), PALETTE indexed (1/2/4/8-bit, PLTE lookup),
    gray+alpha and RGBA (8/16) — the shapes scraped-corpus PNGs
    actually take; tRNS transparency is accepted and ignored (features
    ignore alpha throughout, matching ``_decode_ppm``). Returns
    (width, height, feature) with the same 8-float feature as
    ``_decode_ppm`` (RGB channel means + 5-bucket luminance
    histogram).

    Dispatch contract: returns ``None`` only when the payload is NOT a
    PNG (no magic — caller falls back to the stub); Adam7 interlacing
    deinterlaces through the same filter machinery. A corrupt PNG
    raises loudly —
    silently handing a *decodable-looking* fake to a curation pipeline
    would poison downstream features.

    Speed: the filter reconstruction is pure Python per scanline
    (Sub/Average/Paeth are sequential recurrences along the row); fine
    for thumbnail-scale assets, ~10-100x slower than a C codec on
    megapixel images — swap for PIL in a real deployment, the UDF
    signature does not change.
    """
    if not payload.startswith(_PNG_MAGIC):
        return None
    import struct
    import zlib

    pos = len(_PNG_MAGIC)
    width = height = None
    idat = bytearray()
    plte: bytes | None = None
    # spec-legal (color type → bit depths), PNG 1.2 table 11.1
    _LEGAL = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
              4: (8, 16), 6: (8, 16)}
    try:
        while pos + 8 <= len(payload):
            (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
                pos + 4 : pos + 8
            ]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) < length:
                raise ValueError("png: truncated chunk")
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                width, height, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if width == 0 or height == 0:
                    # the spec requires nonzero dims; a 0x0 "image"
                    # would silently emit NaN features downstream
                    raise ValueError(f"png: invalid dimensions {width}x{height}")
                if color not in _LEGAL or depth not in _LEGAL[color]:
                    raise ValueError(
                        f"png: illegal bit depth {depth} for color type {color}"
                    )
                if interlace not in (0, 1):
                    raise ValueError(f"png: unknown interlace method {interlace}")
                if comp != 0 or filt != 0:
                    raise ValueError("png: unknown compression/filter method")
            elif ctype == b"PLTE":
                if length % 3:
                    raise ValueError("png: PLTE length not divisible by 3")
                plte = bytes(data)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            # tRNS / ancillary chunks: accepted, ignored (alpha is
            # ignored for features throughout)
    except struct.error:
        raise ValueError("png: malformed chunk structure") from None
    if width is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    if color == 3 and plte is None:
        raise ValueError("png: palette image missing PLTE")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bits_px = channels * depth
    stride = (width * bits_px + 7) // 8  # packed scanline bytes
    bpp = max(1, bits_px // 8)  # filter distance, spec-defined
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"png: IDAT inflate failed ({exc})") from None
    def _unfilter(seg: bytes, h: int, w_stride: int) -> "np.ndarray":
        o = np.zeros((h, w_stride), dtype=np.uint8)
        prev = [0] * w_stride
        for y in range(h):
            row = seg[y * (w_stride + 1) : (y + 1) * (w_stride + 1)]
            ftype, line = row[0], list(row[1:])
            if ftype == 0:
                rec = line
            elif ftype == 1:  # Sub
                rec = line[:]
                for x in range(bpp, w_stride):
                    rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
            elif ftype == 2:  # Up
                rec = [(line[x] + prev[x]) & 0xFF for x in range(w_stride)]
            elif ftype == 3:  # Average
                rec = line[:]
                for x in range(w_stride):
                    left = rec[x - bpp] if x >= bpp else 0
                    rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                rec = line[:]
                for x in range(w_stride):
                    left = rec[x - bpp] if x >= bpp else 0
                    ul = prev[x - bpp] if x >= bpp else 0
                    rec[x] = (rec[x] + _paeth(left, prev[x], ul)) & 0xFF
            else:
                raise ValueError(f"png: unknown filter type {ftype} at row {y}")
            o[y] = rec
            prev = rec
        return o

    def _unpack(o: "np.ndarray", h: int, w: int) -> "np.ndarray":
        """(h, packed stride) uint8 → (h, w, channels) int64 samples."""
        if depth == 16:
            return (
                o.reshape(h, -1).view(">u2").reshape(h, w, channels).astype(np.int64)
            )
        if depth == 8:
            return o.reshape(h, w, channels).astype(np.int64)
        bits = np.unpackbits(o, axis=1)[:, : w * depth].reshape(h, w, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        return (bits * weights).sum(axis=2)[..., None]

    if interlace == 0:
        if len(raw) != (stride + 1) * height:
            raise ValueError("png: decompressed size mismatch")
        vals = _unpack(_unfilter(raw, height, stride), height, width)
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the (x0, y0, dx, dy) lattice per pass
        _ADAM7 = (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        )
        vals = np.zeros((height, width, channels), dtype=np.int64)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            stride_p = (wp * bits_px + 7) // 8
            need = (stride_p + 1) * hp
            seg = raw[pos : pos + need]
            if len(seg) < need:
                raise ValueError("png: decompressed size mismatch (Adam7)")
            pos += need
            vals[y0::dy, x0::dx] = _unpack(_unfilter(seg, hp, stride_p), hp, wp)
        if pos != len(raw):
            raise ValueError("png: trailing bytes after Adam7 passes")
    scale = float((1 << depth) - 1)
    if color == 3:  # palette: raw indices, never scaled
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = vals[..., 0]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("png: palette index out of range")
        rgb = pal[idx].reshape(-1, 3).astype(np.float64) / 255.0
    elif color in (0, 4):  # gray / gray+alpha → replicate channel 0
        rgb = np.repeat(
            vals[..., :1].reshape(-1, 1).astype(np.float64) / scale, 3, axis=1
        )
    else:  # RGB / RGBA → drop alpha
        rgb = vals[..., :3].reshape(-1, 3).astype(np.float64) / scale
    lum = rgb @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=5, range=(0.0, 1.0 + 1e-9))[0] / len(lum)
    feat = [round(float(v), 6) for v in rgb.mean(axis=0)] + [
        round(float(v), 6) for v in hist
    ]
    return width, height, feat


def _zigzag_order() -> list[tuple[int, int]]:
    """The 8x8 zigzag scan sequence, generated (not hardcoded): walk
    anti-diagonals; even diagonals run bottom-left→top-right, odd ones
    top-right→bottom-left (ITU T.81 Figure 5 traversal)."""
    out = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1)
        if s % 2:
            rng = reversed(list(rng))
        out.extend((r, s - r) for r in rng)
    return out


_JPEG_ZZ = _zigzag_order()
# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)uπ/16); idct2(B) = AᵀBA
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _JpegBits:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    de-stuffing; RST/EOI markers end the current run (the caller
    re-syncs at restart boundaries)."""

    def __init__(self, data: bytes, pos: int):
        self.d, self.pos, self.buf, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    raise ValueError("jpeg: marker inside entropy segment")
            self.buf, self.n = b, 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Byte-align and consume a 2-byte marker (restart sync)."""
        self.n = 0
        while self.pos + 1 < len(self.d):
            if self.d[self.pos] == 0xFF and self.d[self.pos + 1] != 0x00:
                m = self.d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("jpeg: expected restart marker")


def _huff_decode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_jpeg(payload: bytes) -> tuple[int, int, list[float]] | None:
    """REAL image decode for BASELINE-SEQUENTIAL JPEG (ITU T.81),
    dependency-free: marker parse, canonical-Huffman entropy decode,
    dequantize, inverse zigzag, 8x8 iDCT (numpy basis multiply), and
    YCbCr→RGB (BT.601) with nearest-neighbor chroma upsampling for any
    integer sampling ratio (4:4:4 / 4:2:2 / 4:2:0). Grayscale (1
    component) and YCbCr (3 components) supported; restart markers
    honored.

    Dispatch contract (same as ``_decode_png``): returns ``None`` only
    when the payload is not a JPEG (no SOI magic). A real JPEG outside
    the subset — progressive (SOF2), arithmetic-coded (SOF9/13),
    hierarchical, 12-bit, or CMYK (4 components) — raises
    NotImplementedError loudly; corrupt streams raise ValueError.
    ``extract_features`` quarantines either per row.

    Feature: the shared 8-float image feature (RGB channel means +
    5-bucket luminance histogram). Pure-Python huffman decode is
    thumbnail-speed — swap for a C codec in a real deployment; the UDF
    signature does not change."""
    if not payload.startswith(b"\xff\xd8"):
        return None
    import struct

    try:
        return _decode_jpeg_inner(payload, struct)
    except (IndexError, KeyError, struct.error) as exc:
        # corrupt streams surface as ValueError so the mapInPandas
        # quarantine path catches them uniformly
        raise ValueError(f"jpeg: malformed stream ({type(exc).__name__})") from None


def _decode_jpeg_inner(payload: bytes, struct) -> tuple[int, int, list[float]]:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] | None = None
    w = h = 0
    restart = 0
    progressive = False
    coefs: dict[int, np.ndarray] | None = None  # id → (bh, bw, 64) zz
    mx = my = 0
    n_scans = 0

    def _decode_scan(scan, Ss, Se, Ah, Al, start: int) -> int:
        """Decode ONE entropy-coded scan into the coefficient arrays
        (T.81 sequential + all four progressive scan kinds: DC
        first/refine via successive approximation, AC first with EOB
        runs, AC refinement with correction bits). Returns the offset
        just past the scan's data. Works for interleaved (ns > 1, MCU
        order) and non-interleaved (ns == 1, the component's own block
        grid) scans — which also covers legal BASELINE files carrying
        one scan per component."""
        bits = _JpegBits(payload, start)
        pred = {c["id"]: 0 for c, _, _ in scan}
        state = {"eobrun": 0}

        def dc_unit(comp, dc_t, cf):
            if Ah == 0:  # first pass (sequential: Al == 0 too)
                t = _huff_decode(bits, huff[(0, dc_t)])
                diff = _extend(bits.bits(t), t) if t else 0
                pred[comp["id"]] += diff
                cf[0] = pred[comp["id"]] << Al
            else:  # refinement: one bit
                if bits.bit():
                    cf[0] = int(cf[0]) | (1 << Al)

        def ac_first(ac_t, cf):
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = Ss
            while k <= Se:
                rs = _huff_decode(bits, huff[(1, ac_t)])
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    state["eobrun"] = (1 << r) - 1 + (bits.bits(r) if r else 0)
                    return
                k += r
                if k > Se:
                    raise ValueError("jpeg: AC index overflow")
                cf[k] = _extend(bits.bits(s), s) * (1 << Al)
                k += 1

        def ac_refine(ac_t, cf):
            plus = 1 << Al
            k = Ss
            if state["eobrun"] == 0:
                while k <= Se:
                    rs = _huff_decode(bits, huff[(1, ac_t)])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            # EOB run INCLUDES this block (its
                            # remaining correction bits read below)
                            state["eobrun"] = (1 << r) + (
                                bits.bits(r) if r else 0
                            )
                            break
                        val = 0  # ZRL: skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("jpeg: bad refinement size")
                        val = plus if bits.bit() else -plus
                    while k <= Se:
                        if cf[k] != 0:
                            if bits.bit() and (int(cf[k]) & plus) == 0:
                                cf[k] += plus if cf[k] > 0 else -plus
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= Se:
                        cf[k] = val
                    k += 1
            if state["eobrun"] > 0:
                while k <= Se:
                    if cf[k] != 0:
                        if bits.bit() and (int(cf[k]) & plus) == 0:
                            cf[k] += plus if cf[k] > 0 else -plus
                    k += 1
                state["eobrun"] -= 1

        def data_unit(comp, dc_t, ac_t, by, bx):
            cf = coefs[comp["id"]][by, bx]
            if Ss == 0:
                dc_unit(comp, dc_t, cf)
                if Se > 0:  # sequential scan: AC follows in-band
                    k = 1
                    while k <= Se:
                        rs = _huff_decode(bits, huff[(1, ac_t)])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        cf[k] = _extend(bits.bits(s), s)
                        k += 1
            elif Ah == 0:
                ac_first(ac_t, cf)
            else:
                ac_refine(ac_t, cf)

        def on_restart():
            mk = bits.align_to_marker()
            if not (0xD0 <= mk <= 0xD7):
                raise ValueError(f"jpeg: bad restart marker {mk:#x}")
            for cid in pred:
                pred[cid] = 0
            state["eobrun"] = 0

        if len(scan) > 1:  # interleaved: MCU order
            for mcu in range(mx * my):
                if restart and mcu and mcu % restart == 0:
                    on_restart()
                myy, mxx = divmod(mcu, mx)
                for comp, dc_t, ac_t in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            data_unit(
                                comp, dc_t, ac_t,
                                myy * comp["v"] + by, mxx * comp["h"] + bx,
                            )
        else:  # non-interleaved: the component's own block grid
            comp, dc_t, ac_t = scan[0]
            cw = -(-(w * comp["h"]) // hmax)
            ch_ = -(-(h * comp["v"]) // vmax)
            bw, bh = -(-cw // 8), -(-ch_ // 8)
            for n in range(bw * bh):
                if restart and n and n % restart == 0:
                    on_restart()
                data_unit(comp, dc_t, ac_t, n // bw, n % bw)
        # flush and find the next marker after this scan's data
        p = bits.pos
        while p + 1 < len(payload):
            if payload[p] == 0xFF and payload[p + 1] not in (0x00,) and not (
                0xD0 <= payload[p + 1] <= 0xD7
            ):
                return p
            p += 1
        return len(payload)

    hmax = vmax = 1
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: lost marker sync")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("jpeg: truncated segment")
        pos += 2 + seglen
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                q = np.ones((8, 8))
                for k, (r, c) in enumerate(_JPEG_ZZ):
                    q[r, c] = seg[i + 1 + k]
                qt[tq] = q
                i += 65
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = m == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"jpeg: {nc}-component (CMYK?) unsupported"
                )
            if w == 0 or h == 0:
                raise ValueError("jpeg: zero dimension")
            comps = [
                {
                    "id": seg[6 + 3 * i],
                    "h": seg[7 + 3 * i] >> 4,
                    "v": seg[7 + 3 * i] & 15,
                    "tq": seg[8 + 3 * i],
                }
                for i in range(nc)
            ]
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mx = -(-w // (8 * hmax))
            my = -(-h // (8 * vmax))
            coefs = {
                c["id"]: np.zeros((my * c["v"], mx * c["h"], 64), dtype=np.int64)
                for c in comps
            }
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: non-baseline SOF{m - 0xC0} unsupported"
            )
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                syms = seg[i + 17 : i + 17 + sum(counts)]
                code, si, table = 0, 0, {}
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[si]
                        code += 1
                        si += 1
                    code <<= 1
                huff[(tc, th)] = table
                i += 17 + sum(counts)
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if comps is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in comps}
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((by_id[cid], tabs >> 4, tabs & 15))
            Ss, Se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 15
            if not progressive and (Ss, Se, Ah, Al) != (0, 63, 0, 0):
                raise ValueError("jpeg: bad sequential scan header")
            pos = _decode_scan(scan, Ss, Se, Ah, Al, pos)
            n_scans += 1
        # APPn / COM / others: skipped via seglen
    if comps is None or coefs is None:
        raise ValueError("jpeg: no frame found")
    if n_scans == 0:
        raise ValueError("jpeg: no scan found")
    # reconstruct: dequant + iDCT per block, once, after ALL scans
    planes = {}
    for c in comps:
        arr = coefs[c["id"]]
        bh_, bw_ = arr.shape[0], arr.shape[1]
        plane = np.zeros((bh_ * 8, bw_ * 8))
        q = qt[c["tq"]]
        zz_rows = np.array([r for r, _ in _JPEG_ZZ])
        zz_cols = np.array([cc for _, cc in _JPEG_ZZ])
        for by in range(bh_):
            for bx in range(bw_):
                coef = np.zeros((8, 8))
                coef[zz_rows, zz_cols] = arr[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT_A.T @ (coef * q) @ _DCT_A + 128.0
                )
        planes[c["id"]] = plane
    # upsample to full resolution, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255) / 255.0
        rgb = np.stack([g, g, g], axis=-1).reshape(-1, 3)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).reshape(
            -1, 3
        ) / 255.0
    lum = rgb @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=5, range=(0.0, 1.0 + 1e-9))[0] / len(lum)
    feat = [round(float(v), 6) for v in rgb.mean(axis=0)] + [
        round(float(v), 6) for v in hist
    ]
    return w, h, feat


def _decode_wav(payload: bytes) -> tuple[int, float, list[float]] | None:
    """REAL audio decode for PCM WAV — the stdlib ``wave`` module plus
    numpy. Returns (sample_rate, duration_s, feature) or None for
    non-RIFF/compressed payloads (caller falls back to the stub).
    Feature: RMS energy over 8 equal time segments, normalized to the
    sample width's full scale."""
    if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            sr = wf.getframerate()
            nframes = wf.getnframes()
            sw = wf.getsampwidth()
            raw = wf.readframes(nframes)
    except (wave.Error, EOFError):
        return None
    if sr <= 0 or sw not in (1, 2):
        return None
    duration = round(nframes / sr, 6)
    if sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned, midpoint 128
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    if x.size == 0:
        return sr, duration, [0.0] * 8
    segs = np.array_split(x, 8)
    feat = [
        round(float(np.sqrt(np.mean(s * s))) if s.size else 0.0, 6) for s in segs
    ]
    return sr, duration, feat


def _probe_mp4(payload: bytes) -> tuple[int, int, int, float] | None:
    """REAL MP4/ISO-BMFF CONTAINER probe, dependency-free: walk the box
    tree (ftyp/moov/trak/mdia/stbl...) and read the video track's
    dimensions (tkhd, 16.16 fixed point), duration (mvhd
    timescale+duration), and frame count (stsz sample count) — the
    ffprobe-shaped metadata a curation pipeline filters on, extracted
    without decoding a single frame. Frame DECODE stays stubbed (no
    codec libraries here); this probe makes width/height/n_frames/
    duration real. Returns None when the payload is not ISO-BMFF
    (no ftyp/moov at the top level); malformed boxes raise ValueError
    (quarantined per row)."""
    import struct

    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("mp4: truncated largesize box")
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError(f"mp4: bad box size {size} at {pos}")
            yield btype, pos + hdr, pos + size
            pos += size

    top = {t: (a, b) for t, a, b in boxes(payload, 0, len(payload))} if (
        len(payload) >= 8 and payload[4:8] in (b"ftyp", b"moov")
    ) else None
    if not top or b"moov" not in top:
        return None
    mv_a, mv_b = top[b"moov"]
    duration = 0.0
    width = height = n_frames = 0
    for t, a, b in boxes(payload, mv_a, mv_b):
        if t == b"mvhd":
            ver = payload[a]
            if ver == 1:
                ts, dur = struct.unpack(">IQ", payload[a + 20 : a + 32])
            else:
                ts, dur = struct.unpack(">II", payload[a + 12 : a + 20])
            if ts:
                duration = round(dur / ts, 6)
        elif t == b"trak":
            tw = th = tn = 0
            is_video = False
            for t2, a2, b2 in boxes(payload, a, b):
                if t2 == b"tkhd":
                    ver = payload[a2]
                    off = a2 + (96 if ver == 1 else 84)
                    w16, h16 = struct.unpack(">II", payload[off - 8 : off])
                    tw, th = w16 >> 16, h16 >> 16
                elif t2 == b"mdia":
                    for t3, a3, b3 in boxes(payload, a2, b2):
                        if t3 == b"hdlr":
                            is_video = payload[a3 + 8 : a3 + 12] == b"vide"
                        elif t3 == b"minf":
                            for t4, a4, b4 in boxes(payload, a3, b3):
                                if t4 != b"stbl":
                                    continue
                                for t5, a5, b5 in boxes(payload, a4, b4):
                                    if t5 == b"stsz":
                                        (tn,) = struct.unpack(
                                            ">I", payload[a5 + 8 : a5 + 12]
                                        )
            if is_video:
                width, height, n_frames = tw, th, tn
    if width == 0 and height == 0 and n_frames == 0:
        raise ValueError("mp4: no video track found")
    return width, height, n_frames, duration


# MPEG-1 Layer III bitrate (kbps) and sample-rate tables — ISO 11172-3
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def _probe_mp3(payload: bytes) -> tuple[int, float] | None:
    """REAL MP3 FRAME-HEADER probe: skip an ID3v2 tag (syncsafe size),
    sync to 0xFFE, then walk MPEG-1 Layer III frame headers —
    sample rate from the header table, duration = frames × 1152 /
    rate. The psychoacoustic PCM decode stays stubbed; the metadata a
    pipeline filters on (rate, duration) is real. Returns None when no
    valid frame sync is found OR the FIRST synced header isn't MPEG-1
    Layer III (a 0xFFEx byte pair occurs in arbitrary binaries, and
    MPEG-2/2.5 files are valid audio this probe simply doesn't cover —
    both fall back to the stub instead of quarantining the row);
    ValueError is reserved for corruption AFTER valid frames."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = 0
        for b in payload[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    start = pos
    while pos + 4 <= len(payload):
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
        if pos - start > 4096:  # junk prefix bound: not an MP3
            return None
    else:
        return None
    frames = 0
    rate = None
    while pos + 4 <= len(payload):
        h = payload[pos : pos + 4]
        if not (h[0] == 0xFF and (h[1] & 0xE0) == 0xE0):
            break  # trailing tag/garbage after last frame
        if (h[1] >> 3) & 0x3 != 0x3 or (h[1] >> 1) & 0x3 != 0x1:
            if frames == 0:
                return None  # first sync isn't MPEG-1 L3: not ours
            raise ValueError("mp3: non-MPEG-1-L3 frame after valid frames")
        br_idx, sr_idx = h[2] >> 4, (h[2] >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            if frames == 0:
                return None  # coincidental sync in a non-MP3 payload
            raise ValueError("mp3: bad bitrate/samplerate index")
        r = _MP3_RATES[sr_idx]
        if rate is None:
            rate = r
        flen = 144 * _MP3_BITRATES[br_idx] * 1000 // r + ((h[2] >> 1) & 1)
        frames += 1
        pos += flen
    if frames == 0 or rate is None:
        return None
    return rate, round(frames * 1152 / rate, 6)


def _byte_hist8(payload: bytes) -> list[float]:
    n = len(payload)
    if n:
        hist = np.bincount(np.frombuffer(payload, np.uint8) >> 5, minlength=8)
    else:
        hist = np.zeros(8, dtype=np.int64)
    return [round(int(h) / max(n, 1), 6) for h in hist]


def _decode_audio_stub(payload: bytes) -> tuple[int, float, list[float]]:
    """STUB audio codec. Real deployment: soundfile/torchaudio →
    ``(sr, frames/sr, mfcc(payload))``. Here sample_rate and duration
    derive from payload length; feature = 8 energy-band proxies
    (byte histogram) — deterministic."""
    n = len(payload)
    sample_rate = 8000 * (1 + n % 6)  # 8k..48k
    duration = round(n / sample_rate, 6)
    return sample_rate, duration, _byte_hist8(payload)


def _decode_video_stub(payload: bytes) -> tuple[int, int, int, float, list[float]]:
    """STUB video codec. Real deployment: ffmpeg probe + frame decode →
    ``(w, h, n_frames, duration, pooled_frame_embedding)``. Here all
    values derive deterministically from payload length."""
    n = len(payload)
    width, height = (n % 320) * 4 + 16, (n % 180) * 4 + 16
    n_frames = n // 64 + 1
    duration = round(n_frames / 24.0, 6)  # 24 fps
    return width, height, n_frames, duration, _byte_hist8(payload)


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The binary column is dropped in the output — downstream stages
    never shuffle payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Column-wise iteration (zip over ndarrays), never iterrows —
            # the per-row pandas Series construction is 100× the decode.
            rows = []
            for aid, mod, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                w = h = nf = sr = None
                dur = feat = err = None
                try:
                    if mod == "audio":
                        real = _decode_wav(payload)
                        if real is not None:
                            sr, dur, feat = real
                        else:
                            m = _probe_mp3(payload)
                            if m is not None:
                                # frame-header metadata REAL; the
                                # psychoacoustic PCM decode stays
                                # stubbed (feature = byte histogram)
                                sr, dur = m
                                feat = _byte_hist8(payload)
                            else:
                                sr, dur, feat = _decode_audio_stub(payload)
                    elif mod == "video":
                        probe = _probe_mp4(payload)
                        if probe is not None:
                            # container metadata REAL; frame decode
                            # stays stubbed (feature = byte histogram)
                            w, h, nf, dur = probe
                            feat = _byte_hist8(payload)
                        else:
                            w, h, nf, dur, feat = _decode_video_stub(payload)
                    else:
                        real_im = _decode_png(payload)
                        if real_im is None:
                            real_im = _decode_jpeg(payload)
                        if real_im is None:
                            real_im = _decode_ppm(payload)
                        if real_im is not None:
                            w, h, feat = real_im
                        else:
                            w, h, feat = _decode_image_stub(payload)
                except (ValueError, NotImplementedError) as exc:
                    # quarantine, don't fail the stage: one palette /
                    # 16-bit / truncated asset in a scraped corpus must
                    # not kill a 100 TB job — the loud signal moves from
                    # the stage failure to the decode_error column
                    w = h = nf = sr = None
                    dur = feat = None
                    err = f"{type(exc).__name__}: {exc}"
                rows.append(
                    (aid, mod, len(payload), w, h, nf, sr, dur, feat, err)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    if batch_hint:
        assets = assets.repartition(batch_hint)
    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) to
    decode — generated relationally (sequence+explode) so the expensive
    decode stage receives an already-parallel work list. Duration comes
    from metadata; decode itself is the stubbed stage above."""
    dur = F.coalesce(
        F.element_at(F.col("meta"), "duration_s").cast("int"), F.lit(0)
    )
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_n_seconds))
            ).alias("frame_ts"),
        )
    )


def resize_plan(
    assets: DataFrame, max_w: int = 512, max_h: int = 512
) -> DataFrame:
    """Image resize *plan*: target dimensions (aspect-preserving,
    downscale-only) computed relationally from metadata — the decode+
    rescale UDF stage receives explicit work orders and skips no-ops.
    Pure narrow expressions; no Python, no payload reads."""
    w = F.element_at(F.col("meta"), "width").cast("int")
    h = F.element_at(F.col("meta"), "height").cast("int")
    scale = F.least(F.lit(max_w) / w, F.lit(max_h) / h, F.lit(1.0))
    return (
        assets.filter((F.col("modality") == "image") & w.isNotNull() & h.isNotNull())
        .select(
            "asset_id",
            w.alias("width"),
            h.alias("height"),
            F.round(scale, 6).alias("scale"),
            F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("target_w"),
            F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("target_h"),
            (scale < 1.0).alias("needs_resize"),
        )
    )


def make_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Serialize a solid-color binary PPM (P6) — a REAL image payload
    for the real decode path, built without any codec library."""
    header = f"P6\n# synthetic\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def make_png(
    pixels: "np.ndarray", filters: list[int] | None = None
) -> bytes:
    """Serialize an (h, w, 3|4) uint8 array as a REAL PNG, built with
    stdlib zlib only — the encoder counterpart of ``_decode_png`` for
    tests. ``filters`` picks each scanline's filter type (cycled;
    default exercises all five), so decode tests cover every
    reconstruction branch, not just filter 0."""
    import struct
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    height, width, bpp = px.shape
    color = 2 if bpp == 3 else 6
    filters = filters or [0, 1, 2, 3, 4]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * bpp
    flat = px.reshape(height, stride).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        row = flat[y]
        f = filters[y % len(filters)]
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - ((left + prev) >> 1)
        else:
            pa = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, ul)],
                dtype=np.int16,
            )
            filt = row - pa
        raw.append(f)
        raw += bytes((filt & 0xFF).astype(np.uint8))
        prev = row
    idat = zlib.compress(bytes(raw))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_jpeg(
    pixels: "np.ndarray", quant: int = 16, subsample: bool = False
) -> bytes:
    """Serialize an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    REAL baseline-sequential JPEG, dependency-free — the encoder
    counterpart of ``_decode_jpeg`` for tests. Flat quantization table
    (``quant`` everywhere, written to DQT); Huffman tables are built
    canonically from the stream's actual symbols (JPEG carries its
    tables in DHT — no reliance on the spec's example tables);
    ``subsample=True`` emits 4:2:0 chroma (2x2-averaged), exercising
    the decoder's upsampling path."""
    import struct

    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]

    def _plane_blocks(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
        ph = -(-p.shape[0] // bh) * bh
        pw = -(-p.shape[1] // bw) * bw
        out = np.empty((ph, pw))
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    if gray:
        comps = [(px.astype(np.float64), 1, 1)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = _plane_blocks(cb, ph, pw)[:ph, :pw]
            crp = _plane_blocks(cr, ph, pw)[:ph, :pw]
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            comps = [(y, 2, 2), (cb, 1, 1), (cr, 1, 1)]
        else:
            comps = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    q = np.full((8, 8), float(quant))
    zz_flat = [r * 8 + c for r, c in _JPEG_ZZ]
    # quantized zigzag coefficients for every block, in MCU interleave
    # order (the exact order the decoder consumes)
    padded = [
        _plane_blocks(p, my * 8 * cv, mx * 8 * ch)
        for p, ch, cv in comps
    ]
    tokens = []  # ("dc", cat, val) | ("ac", rs, s, val)
    preds = [0] * len(comps)
    for mcu in range(mx * my):
        myy, mxx = divmod(mcu, mx)
        for ci, (p, ch, cv) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    y0 = (myy * cv + by) * 8
                    x0 = (mxx * ch + bx) * 8
                    blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = np.round((_DCT_A @ blk @ _DCT_A.T) / q).astype(int)
                    zz = coef.flatten()[zz_flat]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    cat = int(abs(diff)).bit_length()
                    tokens.append(("dc", cat, diff))
                    run = 0
                    last_nz = max(
                        (k for k in range(1, 64) if zz[k]), default=0
                    )
                    for k in range(1, last_nz + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            if run == 16:
                                tokens.append(("ac", 0xF0, 0, 0))  # ZRL
                                run = 0
                            continue
                        s = abs(v).bit_length()
                        tokens.append(("ac", (run << 4) | s, s, v))
                        run = 0
                    if last_nz < 63:
                        tokens.append(("ac", 0x00, 0, 0))  # EOB

    def _canonical(symbols: list[int]) -> tuple[dict, bytes]:
        syms = sorted(set(symbols))
        length = max((len(syms)).bit_length(), 2)  # last code < all-ones
        table = {s: (length, i) for i, s in enumerate(syms)}
        counts = [0] * 16
        counts[length - 1] = len(syms)
        return table, bytes(counts) + bytes(syms)

    dc_tab, dc_spec = _canonical([t[1] for t in tokens if t[0] == "dc"])
    ac_tab, ac_spec = _canonical([t[1] for t in tokens if t[0] == "ac"])

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    zz_q = bytes([0]) + bytes(int(q[r, c]) for r, c in _JPEG_ZZ)
    seg(0xDB, zz_q)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + dc_spec)  # DC table 0
    seg(0xC4, bytes([0x10]) + ac_spec)  # AC table 0
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    buf, nbits = 0, 0

    def put(code: int, length: int) -> None:
        nonlocal buf, nbits
        buf = (buf << length) | code
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (buf >> nbits) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        buf &= (1 << nbits) - 1

    for t in tokens:
        if t[0] == "dc":
            _, cat, diff = t
            ln, code = dc_tab[cat]
            put(code, ln)
            if cat:
                put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        else:
            _, rs, s, v = t
            ln, code = ac_tab[rs]
            put(code, ln)
            if s:
                put(v if v >= 0 else v + (1 << s) - 1, s)
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)  # pad with 1s
    out.extend(b"\xff\xd9")
    return bytes(out)


def make_progressive_jpeg(pixels: "np.ndarray", quant: int = 16) -> bytes:
    """Serialize an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    REAL PROGRESSIVE JPEG (SOF2) with a libjpeg-shaped scan script —
    the encoder counterpart of the decoder's progressive path, for
    tests. Scans: interleaved DC first pass (successive approximation
    Al=1), DC refinement, then per component an AC first pass over the
    full 1..63 band at Al=1 and an AC refinement scan (Ah=1, Al=0)
    emitting newly-significant coefficients + correction bits — the
    exact structures T.81 G.1.2 defines and the decoder's
    ac_first/ac_refine consume. 4:4:4 only (progressive AC scans are
    non-interleaved per spec; h=v=1 keeps the block grids aligned).
    Given the same quant table, decoding this progressive stream must
    reconstruct BIT-IDENTICAL coefficients to the baseline encoding of
    the same pixels — pinned in tests."""
    import struct

    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    q = np.full((8, 8), float(quant))
    zz_flat = [r_ * 8 + c_ for r_, c_ in _JPEG_ZZ]
    bw, bh = -(-w // 8), -(-h // 8)
    # zigzag-quantized coefficients per component, block row-major
    comps_zz = []
    for p in planes:
        pad = np.empty((bh * 8, bw * 8))
        pad[:h, :w] = p
        pad[h:, :w] = p[-1:, :]
        pad[:, w:] = pad[:, w - 1 : w]
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.round((_DCT_A @ blk @ _DCT_A.T) / q).astype(int)
                blocks.append(coef.flatten()[zz_flat])
        comps_zz.append(blocks)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(int(q[r_, c_]) for r_, c_ in _JPEG_ZZ))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i in range(len(planes)):
        sof += bytes([i + 1, 0x11, 0])
    seg(0xC2, sof)  # SOF2: progressive

    def _canonical(symbols: list[int]) -> tuple[dict, bytes]:
        syms = sorted(set(symbols)) or [0]
        length = max((len(syms)).bit_length(), 2)
        table = {s: (length, i) for i, s in enumerate(syms)}
        counts = [0] * 16
        counts[length - 1] = len(syms)
        return table, bytes(counts) + bytes(syms)

    class _BW:
        def __init__(self):
            self.buf, self.n = 0, 0
            self.data = bytearray()

        def put(self, code: int, length: int) -> None:
            self.buf = (self.buf << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                self.n -= 8
                byte = (self.buf >> self.n) & 0xFF
                self.data.append(byte)
                if byte == 0xFF:
                    self.data.append(0x00)
            self.buf &= (1 << self.n) - 1

        def done(self) -> bytes:
            if self.n:
                self.put((1 << (8 - self.n)) - 1, 8 - self.n)
            return bytes(self.data)

    def emit_scan(comp_ids, Ss, Se, Ah, Al, tokens, dc_scan):
        """tokens: list of ("h", sym, extra_bits_value, extra_len) or
        ("b", bit). Builds the scan's canonical DHT from its own
        Huffman symbols, then the SOS + entropy data."""
        hsyms = [t[1] for t in tokens if t[0] == "h"]
        tab, spec = _canonical(hsyms)
        if hsyms:
            seg(0xC4, bytes([0x00 if dc_scan else 0x10]) + spec)
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        seg(0xDA, sos)
        bwr = _BW()
        for t in tokens:
            if t[0] == "h":
                ln, code = tab[t[1]]
                bwr.put(code, ln)
                if t[3]:
                    bwr.put(t[2], t[3])
            else:
                bwr.put(t[1], 1)
        out.extend(bwr.done())

    nblocks = bw * bh
    # ---- scan 1: DC first pass, Al=1, interleaved over all comps
    toks = []
    preds = [0] * len(planes)
    for n in range(nblocks):
        for ci in range(len(planes)):
            dc = int(comps_zz[ci][n][0]) >> 1  # arithmetic point transform
            diff = dc - preds[ci]
            preds[ci] = dc
            cat = int(abs(diff)).bit_length()
            toks.append(
                ("h", cat, diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            )
    emit_scan(list(range(1, len(planes) + 1)), 0, 0, 0, 1, toks, True)
    # ---- scan 2: DC refinement (raw bits, no huffman)
    toks = []
    for n in range(nblocks):
        for ci in range(len(planes)):
            toks.append(("b", int(comps_zz[ci][n][0]) & 1))
    emit_scan(list(range(1, len(planes) + 1)), 0, 0, 1, 0, toks, True)
    # ---- per component: AC first (Al=1) then AC refinement (Al=0)
    for ci in range(len(planes)):
        toks = []
        for n in range(nblocks):
            zz = comps_zz[ci][n]
            run = 0
            last_nz = max(
                (k for k in range(1, 64) if abs(int(zz[k])) >> 1), default=0
            )
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                coded = (abs(v) >> 1) * (1 if v > 0 else -1)
                if coded == 0:
                    run += 1
                    if run == 16:
                        toks.append(("h", 0xF0, 0, 0))
                        run = 0
                    continue
                s = abs(coded).bit_length()
                toks.append(
                    ("h", (run << 4) | s,
                     coded if coded >= 0 else coded + (1 << s) - 1, s)
                )
                run = 0
            if last_nz < 63:
                toks.append(("h", 0x00, 0, 0))  # EOB0
        emit_scan([ci + 1], 1, 63, 0, 1, toks, False)
        # refinement: newly-significant (|v| == 1) + correction bits
        toks = []
        for n in range(nblocks):
            zz = comps_zz[ci][n]
            k = 1
            while k <= 63:
                r, corrections, nz_pos, j = 0, [], None, k
                while j <= 63:
                    v = int(zz[j])
                    if abs(v) >= 2:
                        corrections.append(abs(v) & 1)
                    elif v == 0:
                        r += 1
                        if r == 16:
                            toks.append(("h", 0xF0, 0, 0))
                            toks.extend(("b", c) for c in corrections)
                            r, corrections = 0, []
                    else:
                        nz_pos = j
                        break
                    j += 1
                if nz_pos is None:
                    toks.append(("h", 0x00, 0, 0))  # EOB0 (run = 1)
                    toks.extend(("b", c) for c in corrections)
                    break
                toks.append(("h", (r << 4) | 1, 0, 0))
                toks.append(("b", 1 if int(zz[nz_pos]) > 0 else 0))
                toks.extend(("b", c) for c in corrections)
                k = nz_pos + 1
        emit_scan([ci + 1], 1, 63, 1, 0, toks, False)
    out.extend(b"\xff\xd9")
    return bytes(out)


def make_mp4(
    width: int, height: int, n_frames: int, duration_s: float,
    timescale: int = 1000,
) -> bytes:
    """Serialize a minimal, structurally-valid ISO-BMFF container
    (ftyp + moov with one video trak + empty mdat) — the encoder
    counterpart of ``_probe_mp4`` for tests. Carries no codec payload;
    the metadata boxes are real."""
    import struct

    def box(t: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + t + body

    dur = int(round(duration_s * timescale))
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8  # v0, ctime, mtime
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000) + b"\x01\x00" + b"\x00" * 10
        + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 8  # v0+flags, ctime, mtime
        + struct.pack(">I", 1) + b"\x00" * 4 + struct.pack(">I", dur)
        + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = box(
        b"mdhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">II", timescale, dur) + b"\x55\xc4\x00\x00",
    )
    hdlr = box(
        b"hdlr",
        b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00",
    )
    stsd = box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 0))
    stsz = box(
        b"stsz",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, n_frames),
    )
    stbl = box(b"stbl", stsd + stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov + box(b"mdat", b"")


def make_mp3(seconds: float, rate: int = 44100, bitrate_kbps: int = 128) -> bytes:
    """Serialize a structurally-valid MPEG-1 Layer III frame stream
    (correct headers, zeroed payloads — silent, not decodable audio)
    — the encoder counterpart of ``_probe_mp3`` for tests."""
    sr_idx = _MP3_RATES.index(rate)
    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    n_frames = max(1, int(round(seconds * rate / 1152)))
    flen = 144 * bitrate_kbps * 1000 // rate
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
    frame = hdr + b"\x00" * (flen - 4)
    return frame * n_frames


def make_wav(sample_rate: int, seconds: float, freq_hz: float = 440.0) -> bytes:
    """Serialize a PCM16 mono sine WAV via the stdlib ``wave`` module —
    a REAL audio payload for the real decode path."""
    import io
    import wave

    nframes = int(round(sample_rate * seconds))
    t = np.arange(nframes, dtype=np.float64) / sample_rate
    x = (np.sin(2 * np.pi * freq_hz * t) * 0.5 * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def synth_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table for tests (payload bytes are
    a function of asset_id)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j) % 256 for j in range((i % 50) * 20 + 10))
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                payload,
                {"duration_s": str((i % 4) * 10)}
                if modality == "video"
                else (
                    {"width": str(320 + (i % 10) * 120), "height": str(240 + (i % 7) * 80)}
                    if modality == "image"
                    else {}
                ),
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
