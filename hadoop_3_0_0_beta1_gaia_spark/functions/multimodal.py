"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference has no media operators; this is the LLM-pipeline extension
(BASELINE.json north star): treat media as ``binary`` columns with a typed
metadata struct, and run decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas UDFs over ``mapInPandas``.

Decode paths:

- ``decode=real`` — REAL decoders for PNG images (zlib inflate + scanline
  unfilter; 8/16-bit gray/RGB/RGBA/palette), baseline JPEG (functions.jpeg,
  ITU-T T.81), WAV audio (stdlib ``wave`` for 8/16-bit PCM, plus G.711
  µ-law/A-law telephony expansion — ITU formulas verified byte-for-byte
  against the audioop reference), and MJPEG-in-AVI
  video (functions.video: RIFF container walk + per-frame JPEG decode),
  standard library alone. Features are actual signal statistics (image:
  dimensions/channel means/luminance histogram; audio: duration/RMS/
  zero-crossing rate/amplitude histogram; video: frame count/fps/per-frame
  luminance trajectory) and resize is a genuine nearest-neighbor resample
  re-encoded as PNG. Remaining formats (mp3, interframe video codecs)
  raise NotImplementedError at the exact plug point — entropy/motion
  machinery outside pure-stdlib scope, the documented boundary.
- ``decode=fake`` — deterministic md5-seeded features with a DuckDB codegen
  twin; this remains the ORACLE-CHECKED path (the registry entry), since the
  driver testdata has no real media bytes.

The pure-Python unfilter loop is fine for test-sized images; at production
scale you would swap the body of ``png_decode`` for a C codec — every
schema/batching/partitioning contract around it stays identical.

Scale notes: media blobs dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so a partition holds a
bounded number of blobs, and select metadata columns only (column pruning)
when the pipeline stage doesn't touch bytes. mapInPandas streams Arrow
batches, so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("media", BinaryType(), True),  # opaque encoded bytes
        StructField("format", StringType(), True),  # e.g. jpeg/wav/mp4
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (the `decode=real` path)
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # PNG color type → samples


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, interleaved 8-bit pixels)``.

    Standard-library-only: chunk walk + zlib inflate + per-scanline
    unfilter (all five filter types: None/Sub/Up/Average/Paeth). Supports
    8- and 16-bit depth, color types gray/RGB/palette/gray+alpha/RGBA,
    non-interlaced (Adam7 rejected). Palette images are expanded to RGB.
    16-bit samples unfilter at full precision — the PNG spec defines the
    filters on BYTES with the pixel offset in bytes-per-pixel, not samples —
    and are then downsampled to their high byte (the standard 16→8
    approximation), so downstream feature code sees one byte per sample
    regardless of source depth.
    """
    if not data.startswith(PNG_MAGIC):
        raise NotImplementedError(
            "real decode implemented for PNG (here) and baseline JPEG "
            "(functions.jpeg via image_decode); plug an ffmpeg codec here "
            "for video — the batching/schema contract is final"
        )
    pos, ihdr, plte, idat = len(PNG_MAGIC), None, None, []
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + payload + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if (
        depth not in (8, 16)
        or interlace != 0
        or color not in _COLOR_CHANNELS
        or (depth == 16 and color == 3)  # 16-bit palette is not a PNG variant
    ):
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth}, color={color}, "
            f"interlace={interlace}): 8/16-bit non-interlaced only"
        )
    ch = _COLOR_CHANNELS[color]
    bpp = ch * (depth // 8)  # filter offset is in BYTES per pixel (spec §9)
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _row in range(h):
        ft = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                line[i] = (
                    line[i] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
                ) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += line
        prev = line
    if depth == 16:  # big-endian sample pairs → high byte
        out = out[0::2]
    if color == 3:  # palette → RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        rgb = bytearray(len(out) * 3)
        for j, idx in enumerate(out):
            rgb[j * 3 : j * 3 + 3] = plte[idx * 3 : idx * 3 + 3]
        out, ch = rgb, 3
    return w, h, ch, bytes(out)


def png_encode(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    """Encode interleaved 8-bit pixels as a minimal valid PNG (filter 0,
    one IDAT). channels ∈ {1: gray, 3: RGB, 4: RGBA}."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = w * channels
    if len(pixels) != stride * h:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(h)
    )

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _ulaw_to_linear(u: int) -> int:
    """ITU-T G.711 µ-law byte → linear sample on the 16-bit scale (the
    biased-exponent expansion's constants already carry the 2-bit upscale;
    matches the classic audioop convention byte for byte)."""
    u = ~u & 0xFF
    exponent = (u >> 4) & 7
    mantissa = u & 0x0F
    sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return -sample if u & 0x80 else sample


def _alaw_to_linear(a: int) -> int:
    """ITU-T G.711 A-law byte → linear sample on the 16-bit scale (the
    expansion constants carry the 3-bit upscale; A-law transmits the sign
    INVERTED relative to µ-law — bit 7 set means positive; matches the
    classic audioop convention byte for byte)."""
    a ^= 0x55
    exponent = (a >> 4) & 7
    mantissa = a & 0x0F
    if exponent == 0:
        sample = (mantissa << 4) + 8
    else:
        sample = ((mantissa << 4) + 0x108) << (exponent - 1)
    return sample if a & 0x80 else -sample


_ULAW_TABLE = [_ulaw_to_linear(b) for b in range(256)]
_ALAW_TABLE = [_alaw_to_linear(b) for b in range(256)]


def wav_decode(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode WAV bytes to ``(channels, framerate, sampwidth, interleaved
    samples)`` — standard-library only. Formats: PCM 16-bit (signed LE),
    PCM 8-bit (unsigned, re-centered), and G.711 µ-law / A-law telephony
    encodings (format codes 7/6, decoded with the ITU expansion formulas to
    the 16-bit scale, reported as sampwidth 2). The stdlib ``wave`` module
    handles the PCM path; compressed-format WAVs bypass it via a manual
    RIFF fmt/data chunk walk (``wave`` rejects non-PCM outright)."""
    import io
    import struct as _struct
    import sys
    import wave
    from array import array

    if not (data[:4] == b"RIFF" and data[8:12] == b"WAVE"):
        raise NotImplementedError(
            "real audio decode implemented for PCM and G.711 WAV only; plug "
            "an mp3/ffmpeg codec here — the batching/schema contract is final"
        )
    # fmt probe: G.711 needs the manual path (wave raises on non-PCM)
    fmt_code = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = _struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            fmt_code = _struct.unpack("<H", data[pos + 8 : pos + 10])[0]
            break
        pos += 8 + ln + (ln % 2)
    if fmt_code in (6, 7):  # A-law / µ-law
        # precomputed 256-entry expansion tables: the per-byte formula call
        # dominated the audio-fingerprint kernel (1024 samples/clip -> ~50M
        # interpreted calls at a 50k-doc fixture); a list index is the same
        # ITU expansion, memoized
        table = _ALAW_TABLE if fmt_code == 6 else _ULAW_TABLE
        ch, fr = _struct.unpack("<HI", data[pos + 10 : pos + 16])
        payload = None
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (ln,) = _struct.unpack("<I", data[pos + 4 : pos + 8])
            if cid == b"data":
                if pos + 8 + ln > len(data):
                    raise ValueError("malformed WAV: data chunk overruns buffer")
                payload = data[pos + 8 : pos + 8 + ln]
                break
            pos += 8 + ln + (ln % 2)
        if payload is None:
            raise ValueError("malformed WAV: no data chunk")
        return ch, fr, 2, [table[b] for b in payload]
    with wave.open(io.BytesIO(data), "rb") as w:
        ch, sw, fr = w.getnchannels(), w.getsampwidth(), w.getframerate()
        frames = w.readframes(w.getnframes())
    if sw == 2:
        arr = array("h")
        arr.frombytes(frames)
        if sys.byteorder == "big":  # WAV PCM is little-endian
            arr.byteswap()
        samples = arr.tolist()
    elif sw == 1:  # 8-bit WAV is unsigned; re-center to signed
        samples = [b - 128 for b in frames]
    else:
        raise NotImplementedError(f"PCM sample width {sw} not supported (1/2 only)")
    return ch, fr, sw, samples


def _real_audio_features(data: bytes, dim: int) -> list[float]:
    """Actual audio statistics from decoded PCM: [duration_s/60 (capped),
    channels/4, framerate/48k, RMS, zero-crossing rate, 9-bin |amplitude|
    histogram (normalized)] — genuinely a function of the samples."""
    ch, fr, sw, samples = wav_decode(data)
    n = len(samples) // ch
    if n == 0:
        return [0.0] * dim
    full = 32768.0 if sw == 2 else 128.0
    mono = [sum(samples[i * ch : (i + 1) * ch]) / ch for i in range(n)]
    rms = (sum(x * x for x in mono) / n) ** 0.5 / full
    zcr = (
        sum(1 for i in range(1, n) if (mono[i - 1] < 0) != (mono[i] < 0))
        / max(n - 1, 1)
    )
    feats = [min(n / fr / 60.0, 1.0), ch / 4.0, fr / 48000.0, rms, zcr]
    hist = [0] * 9
    for x in mono:
        hist[min(int(abs(x) / full * 9), 8)] += 1
    feats.extend(b / n for b in hist)
    feats = feats[:dim]
    feats.extend(0.0 for _ in range(dim - len(feats)))
    return feats


_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def mp3_probe(data: bytes) -> tuple[int, int, int, int]:
    """Parse MPEG-1 Layer III frame HEADERS (the ffprobe-style metadata
    triage an audio-corpus pipeline runs before deciding what to decode):
    walk the frame chain via the header's own length formula
    ``144 * bitrate / samplerate + padding`` and return
    ``(n_frames, sample_rate, bitrate_kbps, duration_ms)``: sample rate and
    bitrate are the FIRST frame's (consistent headline metadata), duration
    accumulates floor(1152·1000 / sr_i) milliseconds per frame (the Layer
    III 1152-samples-per-frame constant, exact integer arithmetic) so
    mixed-rate VBR chains are timed by each frame's own rate. A frame whose
    declared length runs past the buffer is TRUNCATED and not counted.

    This is a PROBE, not a decoder — sample reconstruction (Huffman +
    IMDCT + synthesis filterbank) stays the documented NotImplementedError
    boundary; the header walk is the real, testable part a pure-stdlib
    engine can own."""
    if not (len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        raise NotImplementedError(
            "audio probe implemented for MPEG-1 Layer III frame chains; "
            "full mp3 DECODE (Huffman+IMDCT+filterbank) is the documented "
            "boundary — plug a codec at wav_decode's NotImplementedError"
        )
    pos = n = dur_ms = 0
    sr0 = br0 = None
    while pos + 4 <= len(data):
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0):
            break
        b1, b2 = data[pos + 1], data[pos + 2]
        if (b1 >> 3) & 3 != 3 or (b1 >> 1) & 3 != 1:
            raise NotImplementedError("MPEG-1 Layer III headers only")
        br_idx, sr_idx, pad = (b2 >> 4) & 0xF, (b2 >> 2) & 3, (b2 >> 1) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("malformed mp3 header (free/bad bitrate or rate)")
        br, sr = _MP3_BITRATES[br_idx], _MP3_RATES[sr_idx]
        flen = 144 * br * 1000 // sr + pad
        if pos + flen > len(data):
            break  # truncated final frame — do not count it
        if br0 is None:
            sr0, br0 = sr, br
        n += 1
        dur_ms += 1152 * 1000 // sr
        pos += flen
    if n == 0:
        raise ValueError("no complete mp3 frame")
    return n, sr0, br0, dur_ms


def image_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode image bytes by container magic: baseline JPEG (SOI) via
    functions.jpeg, else PNG via :func:`png_decode` (which raises the
    NotImplementedError plug point for any other format)."""
    if data[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        return jpeg_decode(data)
    return png_decode(data)


def _real_features(data: bytes, dim: int) -> list[float]:
    """Dispatch real decode by container magic: PNG/JPEG → image statistics,
    RIFF/WAVE → audio statistics, RIFF/AVI (MJPEG) → video statistics over
    every decoded frame; anything else raises at the plug point where an
    mp3/interframe-video codec would go."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return _real_audio_features(data, dim)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from .video import video_features

        return video_features(data, dim)
    return _real_image_features(data, dim)


def _real_image_features(data: bytes, dim: int) -> list[float]:
    """Actual image statistics from a decoded PNG/JPEG: [w/4096, h/4096,
    ch/4, per-channel mean/255 (4 slots, zero-padded), 9-bin luminance
    histogram (normalized)] — deterministic, resolution-independent, and
    genuinely a function of the pixels."""
    w, h, ch, px = image_decode(data)
    n = w * h
    feats = [w / 4096.0, h / 4096.0, ch / 4.0]
    for c in range(4):
        if c < ch:
            feats.append(sum(px[c::ch]) / n / 255.0)
        else:
            feats.append(0.0)
    # luminance = mean over channels (gray: identity)
    hist = [0] * 9
    for j in range(n):
        s = 0
        for c in range(ch):
            s += px[j * ch + c]
        hist[min((s // ch) * 9 // 256, 8)] += 1
    feats.extend(b / n for b in hist)
    feats = feats[:dim]
    feats.extend(0.0 for _ in range(dim - len(feats)))
    return feats


def _fake_features(seed: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: md5-seeded floats."""
    out: list[float] = []
    counter = 0
    raw = b""
    while len(out) < dim:
        raw = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        for k in range(0, len(raw), 4):
            if len(out) >= dim:
                break
            out.append(int.from_bytes(raw[k : k + 4], "big") / 2**32)
        counter += 1
    return out


def duckdb_fake_feature_terms(text_sql: str, dim: int = FEATURE_DIM) -> list[str]:
    """DuckDB codegen twin of :func:`_fake_features` over a TEXT blob: one
    DOUBLE-typed term per feature, bit-identical to the Arrow float32 values
    the fake kernel emits (md5(seed || counter_be32) → 4-byte big-endian
    chunks / 2^32 → FLOAT4 → DOUBLE). NUL counter bytes ride in a
    ``decode(blob)`` string — DuckDB strings are length-prefixed, so md5
    hashes them fully."""
    terms = []
    for j in range(dim):
        counter, k = divmod(j, 4)
        cb = "".join(f"\\x{b:02x}" for b in counter.to_bytes(4, "big"))
        terms.append(
            f"CAST(CAST((('0x' || substr(md5(coalesce({text_sql}, '') || "
            f"decode('{cb}'::BLOB)), {1 + 8 * k}, 8))::BIGINT) / 4294967296.0 "
            "AS FLOAT4) AS DOUBLE)"
        )
    return terms


def decode_features(
    df: DataFrame, decode: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """media bytes → feature vector (array<float>), Arrow-batched.

    Output schema: (media_id long, kind string, features array<float>).
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decode == "real":
                # genuine decode: PNG via the stdlib codec above; other
                # formats raise NotImplementedError inside png_decode at the
                # exact point a jpeg/ffmpeg codec would plug in
                feats = [
                    _real_features(bytes(b), dim) if b is not None else None
                    for b in pdf["media"]
                ]
            else:
                feats = [
                    _fake_features(bytes(b) if b is not None else b"", dim)
                    for b in pdf["media"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=schema)


def png_resize_nn(data: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor PNG resize, decode → resample → re-encode (stdlib
    only). Palette inputs come back as RGB (png_decode expands them)."""
    w, h, ch, px = png_decode(data)
    out = bytearray(width * height * ch)
    for y in range(height):
        sy = y * h // height
        row = sy * w * ch
        dst = y * width * ch
        for x in range(width):
            sx = x * w // width
            out[dst + x * ch : dst + (x + 1) * ch] = px[
                row + sx * ch : row + (sx + 1) * ch
            ]
    return png_encode(width, height, ch, bytes(out))


def resize_stub(df: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize: metadata is updated for real (the Spark-side part); the
    pixel transform is a genuine nearest-neighbor resample for PNG bytes
    (``decode=real``) or an md5-rehash stand-in (``decode=fake``)."""

    schema = MEDIA_SCHEMA

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            if decode == "real":
                pdf["media"] = [
                    png_resize_nn(bytes(b), width, height) if b is not None else None
                    for b in pdf["media"]
                ]
            else:
                pdf["media"] = [
                    hashlib.md5(bytes(b) + b"resize").digest() if b is not None else None
                    for b in pdf["media"]
                ]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def frame_sample(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (decode stubbed — the frame payload is a deterministic digest). Pure
    Spark-side: explode over the sampled timestamp grid from duration_ms."""
    grid = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(grid).alias("frame_ms"),
        F.md5(F.concat(F.col("media").cast("string"), F.lit(":"), F.col("duration_ms").cast("string"))).alias(
            "frame_digest"
        ),
    )
    return frames


def png_roundtrip_stats(
    df: DataFrame, id_col: str = "doc_id", w: int = 4, h: int = 4
) -> DataFrame:
    """Drive the REAL PNG codec end-to-end inside a distributed Arrow kernel:
    per row, derive ``w*h`` gray pixels from the md5 digest of the id (the
    same bytes an SQL oracle can reproduce hex-pair by hex-pair), encode them
    with :func:`png_encode`, decode the bytes back with :func:`png_decode`,
    and emit pixel statistics plus the round-trip verdict.

    This is the registered proof that ``decode=real`` is a working codec, not
    a stub: the stats come from pixels that crossed a real PNG byte stream
    (zlib deflate → chunk walk → inflate → unfilter). mapInPandas keeps the
    contract identical to :func:`decode_features` — Arrow batches in, Arrow
    batches out, no driver involvement, embarrassingly parallel at any scale.
    """
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    n = w * h
    if n > 16:
        raise ValueError("md5 digest provides 16 deterministic bytes max")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("px_sum", LongType()),
            StructField("px_min", LongType()),
            StructField("px_max", LongType()),
            StructField("roundtrip_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                px = hashlib.md5(f"{int(did)}:px".encode()).digest()[:n]
                png = png_encode(w, h, 1, px)
                dw, dh, ch, back = png_decode(png)
                ok = (dw, dh, ch) == (w, h, 1) and back == px
                rows.append(
                    (int(did), int(sum(px)), int(min(px)), int(max(px)), bool(ok))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.select(id_col).mapInPandas(kernel, schema)


def wav_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drive the REAL PCM-WAV codec end-to-end inside a distributed Arrow
    kernel (the audio member of the codec-proof family, next to
    :func:`png_roundtrip_stats` / :func:`jpeg_roundtrip_stats`): per row,
    derive eight signed 16-bit samples from the md5 digest of the id
    (little-endian pairs — exactly how PCM lays them out), ENCODE them as a
    mono 8 kHz WAV byte stream with the stdlib ``wave`` writer and DECODE
    back through :func:`wav_decode`. PCM is lossless, so the round trip is
    bit-exact by construction and the sample statistics carry an exact SQL
    oracle reproducing the signed values hex-pair by hex-pair.
    """
    import hashlib
    import io
    import wave as wave_mod

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("s_sum", LongType()),
            StructField("s_min", LongType()),
            StructField("s_max", LongType()),
            StructField("roundtrip_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                raw = hashlib.md5(f"{int(did)}:wav".encode()).digest()  # 16 B
                samples = [
                    int.from_bytes(raw[i : i + 2], "little", signed=True)
                    for i in range(0, 16, 2)
                ]
                bio = io.BytesIO()
                with wave_mod.open(bio, "wb") as wv:
                    wv.setnchannels(1)
                    wv.setsampwidth(2)
                    wv.setframerate(8000)
                    wv.writeframes(raw)
                ch, fr, sw, back = wav_decode(bio.getvalue())
                ok = (ch, fr, sw) == (1, 8000, 2) and back == samples
                rows.append(
                    (
                        int(did),
                        int(sum(back)),
                        int(min(back)),
                        int(max(back)),
                        bool(ok),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col).mapInPandas(kernel, schema)


def mp3_probe_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drive the MP3 header probe end-to-end inside a distributed Arrow
    kernel: per row, derive (bitrate, sample rate, frame count) from the md5
    digest of the id, BUILD a valid MPEG-1 Layer III frame chain (real sync
    words, real header fields, zero audio payload), and walk it back with
    :func:`mp3_probe` — the audio-corpus triage step (duration/bitrate
    stats) run exactly as a production pipeline runs it, with every output
    reproducible hex-pair by hex-pair by a SQL oracle. Sample decode stays
    the documented boundary; the header walk is real."""
    import hashlib

    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_frames", LongType()),
            StructField("sample_rate", LongType()),
            StructField("bitrate_kbps", LongType()),
            StructField("duration_ms", LongType()),
            StructField("probe_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                raw = hashlib.md5(f"{int(did)}:mp3".encode()).digest()
                br_idx = 1 + raw[0] % 14
                sr_idx = raw[1] % 3
                n = 2 + raw[2] % 3
                br, sr = _MP3_BITRATES[br_idx], _MP3_RATES[sr_idx]
                flen = 144 * br * 1000 // sr
                frame = bytes(
                    [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0]
                ) + b"\x00" * (flen - 4)
                got_n, got_sr, got_br, dur = mp3_probe(frame * n)
                ok = (got_n, got_sr, got_br) == (n, sr, br)
                rows.append((int(did), got_n, got_sr, got_br, dur, bool(ok)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col).mapInPandas(kernel, schema)


def jpeg_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drive the REAL baseline-JPEG codec end-to-end inside a distributed
    Arrow kernel (the jpeg twin of :func:`png_roundtrip_stats`): per row,
    derive four flat 8x8 block levels from the md5 digest of the id, tile
    them into a 16x16 grayscale image, ENCODE with functions.jpeg at
    quality=100 and DECODE the byte stream back through the full
    Huffman/dequant/IDCT path.

    At quality 100 every quantizer is 1 and a flat block is DC-only, so the
    lossy codec round-trips these images BIT-EXACTLY — which is what lets the
    stats carry an exact SQL oracle: sum over the decoded 256 pixels is
    64 * sum(levels), min/max are the level extremes, all reproducible
    hex-pair by hex-pair from the same md5. roundtrip_ok asserts the decoded
    buffer equals the constructed one byte for byte.
    """
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from .jpeg import jpeg_decode, jpeg_encode

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("px_sum", LongType()),
            StructField("px_min", LongType()),
            StructField("px_max", LongType()),
            StructField("roundtrip_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                levels = hashlib.md5(f"{int(did)}:jb".encode()).digest()[:4]
                buf = bytearray(256)
                for b, (by, bx) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
                    for y in range(8):
                        row = (by + y) * 16 + bx
                        for x in range(8):
                            buf[row + x] = levels[b]
                data = jpeg_encode(16, 16, 1, bytes(buf), quality=100)
                dw, dh, ch, back = jpeg_decode(data)
                ok = (dw, dh, ch) == (16, 16, 1) and back == bytes(buf)
                rows.append(
                    (
                        int(did),
                        int(sum(back)),
                        int(min(back)),
                        int(max(back)),
                        bool(ok),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col).mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# perceptual image near-dup: 63-bit dHash (difference hash)
# ---------------------------------------------------------------------------

# dHash grid: 8 pixels per row x 9 rows -> 7 horizontal comparisons per row
# x 9 rows = 63 bits. 63 rather than the classic 64 keeps the fingerprint in
# non-negative BIGINT range on BOTH engines (bit 63 is the sign bit; Spark
# ANSI errors on signed overflow, DuckDB arithmetic is signed BIGINT) — the
# same portability argument as dedup.simhash64, whose banded-Hamming
# machinery this fingerprint plugs straight into.
DHASH_W = 8
DHASH_H = 9


def dhash_pixels(did: int) -> bytes:
    """Deterministic 9x8 gray test image for document ``did`` (row-major),
    reproducible hex-pair by hex-pair in SQL (the image_decode_roundtrip
    oracle method) — the driver testdata ships no real media bytes, so
    pixels are md5-synthesized with NEAR-DUP STRUCTURE built in:

    - docs with ``did % 20 == 7`` share one constant "logo" image (the
      boilerplate/banner case — identical fingerprints, quadratic pair
      blow-up, the content the bucket cap exists to govern);
    - everyone else draws its base image from its GROUP seed
      (``did // 4`` — groups of 4 near-identical images), then members with
      ``did % 4 != 0`` get ONE pixel perturbed (at row ``did % 9``, column
      ``did % 8``, value from md5 of the doc id). One changed pixel flips at
      most 2 adjacent-comparison bits, two perturbed members differ in at
      most 2 pixels -> Hamming distance <= 4 within a group (members 1..3
      perturb DISTINCT pixels: their row indices differ mod 9 for id deltas
      1..3), so radius-4 search recovers every group pair by pigeonhole.
    """
    logo = did % 20 == 7
    seed = "logo" if logo else str(did // 4)
    px = bytearray()
    for r in range(DHASH_H):
        px += hashlib.md5(f"{seed}:img:{r}".encode()).digest()[:DHASH_W]
    if not logo and did % 4 != 0:
        px[(did % 9) * DHASH_W + (did % 8)] = hashlib.md5(
            f"{did}:pert".encode()
        ).digest()[0]
    return bytes(px)


def dhash63_of_pixels(px: bytes) -> int:
    """63-bit difference hash of a row-major 9x8 gray image: bit
    ``r*7 + c`` is set iff ``px[r][c] > px[r][c+1]`` (strict; ties clear)."""
    fp = 0
    for r in range(DHASH_H):
        row = r * DHASH_W
        for c in range(DHASH_W - 1):
            if px[row + c] > px[row + c + 1]:
                fp |= 1 << (r * (DHASH_W - 1) + c)
    return fp


def image_dhash63(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document 63-bit perceptual dHash with the REAL PNG codec in the
    loop: synthesize the 9x8 gray image (:func:`dhash_pixels`), encode it to
    a real PNG byte stream, decode the bytes back (:func:`png_encode` /
    :func:`png_decode` — zlib deflate, chunk walk, inflate, unfilter), and
    fingerprint the DECODED pixels. The oracle computes the same hash from
    the synthesized pixels directly, so any codec defect shows up as a
    fingerprint mismatch — the dedup analog of image_decode_roundtrip's
    codec proof. mapInPandas Arrow kernel: entirely map-side, zero
    exchanges, embarrassingly parallel; at a real 100 TB corpus the synth
    step is replaced by reading the binary column and the grid by a real
    downsample (png_resize_nn), with every contract downstream unchanged.

    Output: (id, dhash) — plugs into dedup.hamming63_pairs (banding,
    bucket cap, bit_count verify) exactly like the text simhash64.

    Integer-id contract: the kernel synthesizes pixels from ``int(did)``
    and emits int64, so ``id_col`` must be an integral column; both output
    fields are declared LongType to match what the Arrow batch actually
    carries (declaring the input column's own type here would mis-declare
    an int32/decimal id at Arrow conversion).
    """
    import pandas as pd
    from pyspark.sql.types import IntegralType

    if not isinstance(df.schema[id_col].dataType, IntegralType):
        raise TypeError(
            f"image_dhash63 requires an integral id column; "
            f"{id_col!r} is {df.schema[id_col].dataType.simpleString()}"
        )
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("dhash", LongType(), False),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids = []
            fps = []
            for did in pdf[id_col]:
                did = int(did)
                px = dhash_pixels(did)
                png = png_encode(DHASH_W, DHASH_H, 1, px)
                dw, dh, ch, back = png_decode(png)
                if (dw, dh, ch) != (DHASH_W, DHASH_H, 1):
                    raise ValueError(
                        f"PNG round trip returned {dw}x{dh}x{ch} for doc {did}"
                    )
                ids.append(did)
                fps.append(dhash63_of_pixels(back))
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"),
                 "dhash": pd.Series(fps, dtype="int64")}
            )

    from ..session import ensure_parallelism

    # the codec kernel is the CPU cost — spread a one-row-group scan across
    # cores before it (no-op at the thousands-of-files 100 TB layout)
    return ensure_parallelism(df.select(id_col)).mapInPandas(kernel, schema)


def duckdb_image_dhash63(table: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`image_dhash63` — rebuilds the synthesized
    pixels hex-pair by hex-pair from the same md5 seeds (logo / group /
    perturbation rules identical) and assembles the 63 comparison bits with
    exact integer arithmetic. No codec on this side: the PNG trip is
    lossless, so pixel-identical input implies fingerprint-identical output
    — which is precisely what makes this an oracle on the Spark side's
    codec + hash chain."""
    rows = ",\n               ".join(
        f"md5(seed || ':img:{r}') AS h{r}" for r in range(DHASH_H)
    )
    pixels = ",\n               ".join(
        f"CASE WHEN pert AND pr = {r} AND pc = {c} THEN pv "
        f"ELSE ('0x' || substr(h{r}, {2 * c + 1}, 2))::BIGINT END AS p{r}_{c}"
        for r in range(DHASH_H)
        for c in range(DHASH_W)
    )
    bits = " + ".join(
        f"CASE WHEN p{r}_{c} > p{r}_{c + 1} "
        f"THEN CAST({1 << (r * (DHASH_W - 1) + c)} AS BIGINT) ELSE 0 END"
        for r in range(DHASH_H)
        for c in range(DHASH_W - 1)
    )
    return f"""
        SELECT id, CAST({bits} AS BIGINT) AS dhash FROM (
            SELECT id, {pixels}
            FROM (
                SELECT {id_col} AS id,
                       CASE WHEN {id_col} % 20 = 7 THEN 'logo'
                            ELSE CAST({id_col} // 4 AS VARCHAR) END AS seed,
                       ({id_col} % 20 <> 7 AND {id_col} % 4 <> 0) AS pert,
                       {id_col} % 9 AS pr,
                       {id_col} % 8 AS pc,
                       ('0x' || substr(md5({id_col}::VARCHAR || ':pert'), 1, 2))::BIGINT AS pv,
                       {rows}
                FROM {table}
            )
        )
    """


# ---------------------------------------------------------------------------
# Perceptual audio near-dup fingerprint (the chromaprint-style pipeline step)
# ---------------------------------------------------------------------------

AUDIO_FRAMES = 64      # energy frames per clip -> 63 delta bits
AUDIO_FRAME_LEN = 16   # µ-law samples per frame (one md5 digest)


def audio_ulaw_bytes(did: int) -> bytes:
    """Deterministic µ-law clip for document ``did`` with built-in near-dup
    structure — the audio twin of :func:`dhash_pixels`:

    - documents with ``did % 20 == 7`` all carry the SAME "jingle" clip
      (intros/ringbacks/station idents — the boilerplate-audio cohort whose
      identical fingerprints blow up quadratically, governed by the capped
      twin);
    - the rest form groups of 4 (seed ``did // 4``) where members with
      ``did % 4 != 0`` replace ONE 16-sample frame (index ``did % 64`` —
      distinct frames within a group since the 4 ids are consecutive) with
      an md5-derived burst, the audio analog of a clipped/re-edited beat.
      One replaced frame changes one frame energy, which flips at most the
      2 delta bits adjacent to that frame -> pair Hamming <= 4 within a
      group, so radius-4 banded search recovers every group pair by
      pigeonhole. (A single perturbed SAMPLE would rarely flip any bit —
      adjacent frame-energy deltas run ~30k while one µ-law sample moves
      the sum by at most ~32k and usually far less; the full-frame burst
      moves the energy enough to actually exercise Hamming 1..4 pairs.)
    """
    jingle = did % 20 == 7
    seed = "jingle" if jingle else str(did // 4)
    payload = bytearray()
    for fr in range(AUDIO_FRAMES):
        payload += hashlib.md5(f"{seed}:aud:{fr}".encode()).digest()
    if not jingle and did % 4 != 0:
        fr = did % AUDIO_FRAMES
        payload[fr * AUDIO_FRAME_LEN : (fr + 1) * AUDIO_FRAME_LEN] = hashlib.md5(
            f"{did}:pert".encode()
        ).digest()
    return bytes(payload)


def g711_wav_encode(
    payload: bytes, fmt_code: int = 7, framerate: int = 8000
) -> bytes:
    """Minimal RIFF/WAVE container around a mono G.711 payload (fmt code 7 =
    µ-law, 6 = A-law) — the write-side counterpart of :func:`wav_decode`'s
    manual chunk walk (the stdlib ``wave`` writer rejects non-PCM)."""
    if fmt_code not in (6, 7):
        raise ValueError("g711_wav_encode writes G.711 WAV only (fmt 6/7)")
    fmt = struct.pack("<HHIIHH", fmt_code, 1, framerate, framerate, 1, 8)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audiofp63_of_samples(samples: list[int]) -> int:
    """63-bit energy-delta fingerprint of a decoded mono clip: frame ``f``'s
    energy is the exact integer sum of ``|sample|`` over its
    ``AUDIO_FRAME_LEN`` samples; bit ``f`` is set iff
    ``energy[f] > energy[f+1]`` (strict; ties clear). The shape of a
    chromaprint/dejavu spectral-delta fingerprint with the FFT band energies
    replaced by exact time-domain frame energies — integer-exact on both
    engines, which is what makes it oracle-twinnable."""
    if len(samples) != AUDIO_FRAMES * AUDIO_FRAME_LEN:
        raise ValueError(
            f"expected {AUDIO_FRAMES * AUDIO_FRAME_LEN} samples, got {len(samples)}"
        )
    energies = [
        sum(abs(s) for s in samples[f * AUDIO_FRAME_LEN : (f + 1) * AUDIO_FRAME_LEN])
        for f in range(AUDIO_FRAMES)
    ]
    fp = 0
    for f in range(AUDIO_FRAMES - 1):
        if energies[f] > energies[f + 1]:
            fp |= 1 << f
    return fp


def audio_fingerprint63(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document 63-bit perceptual audio fingerprint with the REAL G.711
    WAV codec in the loop: synthesize the µ-law clip
    (:func:`audio_ulaw_bytes`), wrap it in a real RIFF/WAVE byte stream
    (:func:`g711_wav_encode`), decode the bytes back through
    :func:`wav_decode` (RIFF chunk walk + ITU-T G.711 µ-law expansion), and
    fingerprint the DECODED linear samples. The oracle expands the same
    µ-law bytes arithmetically from the md5 seeds, so any defect in the
    container walk or the expansion formula shows up as a fingerprint
    mismatch — wav_decode_roundtrip's codec proof composed with dedup,
    exactly as image_dhash63 composes the PNG proof.

    mapInPandas Arrow kernel: entirely map-side, zero exchanges. At a real
    100 TB corpus the synth step is replaced by reading the audio binary
    column and the frame energies by FFT band energies — every contract
    downstream (schema, banding, cap, bit_count verify) unchanged.

    Output: (id, afp) — plugs into dedup.hamming63_pairs (banding, bucket
    cap, bit_count verify) exactly like the text simhash64 and image dhash.
    Integer-id contract: the kernel synthesizes the clip from ``int(did)``
    and emits int64; both output fields are LongType.
    """
    import pandas as pd
    from pyspark.sql.types import IntegralType

    if not isinstance(df.schema[id_col].dataType, IntegralType):
        raise TypeError(
            f"audio_fingerprint63 requires an integral id column; "
            f"{id_col!r} is {df.schema[id_col].dataType.simpleString()}"
        )
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("afp", LongType(), False),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np

        # vectorized twin of audiofp63_of_samples (hand-equality-pinned in
        # tests): |samples| reshaped (frames, frame_len), exact int64 row
        # sums, strict-greater deltas dotted with the bit weights
        weights = (1 << np.arange(AUDIO_FRAMES - 1, dtype=np.int64))

        def fp_of(samples: list[int]) -> int:
            e = (
                np.abs(np.asarray(samples, dtype=np.int64))
                .reshape(AUDIO_FRAMES, AUDIO_FRAME_LEN)
                .sum(axis=1)
            )
            return int(((e[:-1] > e[1:]).astype(np.int64) * weights).sum())

        for pdf in batches:
            ids = []
            fps = []
            for did in pdf[id_col]:
                did = int(did)
                wav = g711_wav_encode(audio_ulaw_bytes(did))
                ch, fr, sw, samples = wav_decode(wav)
                if (ch, fr, sw) != (1, 8000, 2):
                    raise ValueError(
                        f"G.711 WAV round trip returned ch={ch} fr={fr} "
                        f"sw={sw} for doc {did}"
                    )
                ids.append(did)
                fps.append(fp_of(samples))
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"),
                 "afp": pd.Series(fps, dtype="int64")}
            )

    from ..session import ensure_parallelism

    # the codec kernel is the CPU cost — spread a one-row-group scan across
    # cores before it (no-op at the thousands-of-files 100 TB layout)
    return ensure_parallelism(df.select(id_col)).mapInPandas(kernel, schema)


def duckdb_audio_fingerprint63(table: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`audio_fingerprint63` — rebuilds the µ-law clip
    hex-pair by hex-pair from the same md5 seeds (jingle / group /
    perturbation rules identical) and expands each byte with the exact ITU
    G.711 integer formula (complement, biased exponent, mantissa — the
    arithmetic form of :func:`_ulaw_to_linear`'s table), then assembles the
    63 energy-delta bits. No codec on this side: G.711 decode is a pure
    byte->sample function, so byte-identical input implies
    fingerprint-identical output — which makes this an oracle on the Spark
    side's RIFF walk + expansion + hash chain."""
    mag = "((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132"
    return f"""
        SELECT id,
               CAST(sum(CASE WHEN nxt IS NOT NULL AND energy > nxt
                             THEN (1::BIGINT << fr) ELSE 0 END) AS BIGINT) AS afp
        FROM (
            SELECT id, fr, energy,
                   lead(energy) OVER (PARTITION BY id ORDER BY fr) AS nxt
            FROM (
                SELECT id, fr,
                       sum(abs(CASE WHEN u >= 128 THEN -({mag})
                                    ELSE {mag} END)) AS energy
                FROM (
                    SELECT id, fr, p,
                           255 - ('0x' || substr(
                               CASE WHEN pert AND fr = pfr
                                    THEN md5(id::VARCHAR || ':pert')
                                    ELSE md5(seed || ':aud:' || fr::VARCHAR)
                               END,
                               CAST(2 * p + 1 AS INT), 2))::BIGINT AS u
                    FROM (
                        SELECT {id_col} AS id,
                               CASE WHEN {id_col} % 20 = 7 THEN 'jingle'
                                    ELSE CAST({id_col} // 4 AS VARCHAR)
                               END AS seed,
                               ({id_col} % 20 <> 7 AND {id_col} % 4 <> 0) AS pert,
                               {id_col} % {AUDIO_FRAMES} AS pfr
                        FROM {table}
                    ),
                    range({AUDIO_FRAMES}) t_fr(fr),
                    range({AUDIO_FRAME_LEN}) t_p(p)
                )
                GROUP BY id, fr
            )
        )
        GROUP BY id
    """
