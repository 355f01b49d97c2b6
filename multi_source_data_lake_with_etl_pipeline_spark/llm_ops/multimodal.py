"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas`` UDFs.

The Spark-side plumbing (schemas, batch iteration, partition-parallel
decode fan-out) is real and tested. Decode itself is REAL for the
formats the standard library + numpy can parse — PPM (P6) images,
8-bit truecolor PNG (stdlib zlib inflate + scanline-filter
reconstruction, ``_decode_png``), and PCM WAV audio
(``_decode_ppm``/``_decode_wav``, dispatched by payload magic) — and
STUBBED for the remaining compressed codecs (JPEG/MP3/MP4: this
container ships no image/audio libraries) behind ``_decode_*_stub``,
which produce deterministic fakes so the pipeline shape stays
exercisable end-to-end. A PNG outside the supported subset rejects
LOUDLY (never a silent fake). Swap the stubs for PIL/torchaudio/
ffmpeg in a real deployment — the UDF signature and partitioning
strategy do not change.

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
    inflate + per-scanline filter reconstruction). Subset: 8-bit
    truecolor, color type 2 (RGB) or 6 (RGBA), non-interlaced — the
    shape virtually every ML-pipeline PNG takes. Returns
    (width, height, feature) with the same 8-float feature as
    ``_decode_ppm`` (RGB channel means + 5-bucket luminance histogram;
    alpha is ignored for both).

    Dispatch contract: returns ``None`` only when the payload is NOT a
    PNG (no magic — caller falls back to the stub). A real PNG outside
    the subset (palette, 16-bit, grayscale, interlaced) or a corrupt
    one raises loudly — silently handing a *decodable-looking* fake to
    a curation pipeline would poison downstream features.

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
                if depth != 8 or color not in (2, 6):
                    raise NotImplementedError(
                        f"png: only 8-bit RGB/RGBA supported "
                        f"(bit depth {depth}, color type {color})"
                    )
                if interlace != 0:
                    raise NotImplementedError("png: interlaced (Adam7) unsupported")
                if comp != 0 or filt != 0:
                    raise ValueError("png: unknown compression/filter method")
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
    except struct.error:
        raise ValueError("png: malformed chunk structure") from None
    if width is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    bpp = 3 if color == 2 else 4
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"png: IDAT inflate failed ({exc})") from None
    if len(raw) != (stride + 1) * height:
        raise ValueError("png: decompressed size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = [0] * stride
    for y in range(height):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], list(row[1:])
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line[:]
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = [(line[x] + prev[x]) & 0xFF for x in range(stride)]
        elif ftype == 3:  # Average
            rec = line[:]
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line[:]
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype} at row {y}")
        out[y] = rec
        prev = rec
    px = out.reshape(height, width, bpp)[:, :, :3].reshape(-1, 3)
    rgb = px.astype(np.float64) / 255.0
    lum = rgb @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=5, range=(0.0, 1.0 + 1e-9))[0] / len(lum)
    feat = [round(float(v), 6) for v in rgb.mean(axis=0)] + [
        round(float(v), 6) for v in hist
    ]
    return width, height, feat


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
                            sr, dur, feat = _decode_audio_stub(payload)
                    elif mod == "video":
                        w, h, nf, dur, feat = _decode_video_stub(payload)
                    else:
                        real_im = _decode_png(payload)
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
