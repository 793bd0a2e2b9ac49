"""Pure-stdlib MJPEG-in-AVI video codec — the video member of the
codec-proof family (PNG: multimodal.png_decode, JPEG: functions.jpeg,
WAV: multimodal.wav_decode).

Motion-JPEG stores every video frame as an independent baseline-JPEG image
inside a RIFF AVI container (Microsoft AVI RIFF spec: ``RIFF('AVI ' LIST
('hdrl' 'avih' LIST('strl' 'strh' 'strf')) LIST('movi' '00dc'...) 'idx1')``).
That makes it the one mainstream video format a pure-public, stdlib-only
engine can decode COMPLETELY: the container walk is byte arithmetic and each
frame payload goes through the repo's own ITU-T T.81 baseline JPEG codec.
Interframe codecs (H.264/VP9/AV1) need entropy/motion machinery far outside
stdlib scope and remain the documented NotImplementedError boundary in
``multimodal.png_decode`` / ``_real_features``.

Scale posture: frame sampling is embarrassingly parallel — each row's
container decodes independently inside a mapInPandas Arrow kernel; no frame
index or shared state crosses rows. At 100 TB the media column dominates row
size, so the kernels select only (id, media) and the Arrow batch size bounds
per-task memory.
"""

from __future__ import annotations

import hashlib
import struct

from .jpeg import jpeg_decode_batch, jpeg_encode


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + payload, padded to even."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def avi_encode_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Wrap pre-encoded JPEG frame payloads in a minimal valid AVI container
    (MJPG video stream, no audio). Frames must share one geometry."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    usec_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (rate/scale = fps)
            0,  # dwStart
            len(frames),  # dwLength (in frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0 = varying)
            0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", f) for f in frames]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1: one entry per frame; offsets are relative to the 'movi' fourcc
    idx, off = [], 4
    for f, ck in zip(frames, movi_chunks):
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(ck)
    idx1 = _chunk(b"idx1", b"".join(idx))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def avi_decode_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an AVI container and return ``(width, height, fps, jpeg_frames)``
    — the JPEG payloads still encoded (decode each via functions.jpeg).

    Walks the RIFF chunk tree by byte arithmetic: 'avih' for geometry and
    frame timing, the 'movi' LIST for '00dc'/'00db' video payloads. Streams
    other than MJPG video raise at the plug point where an interframe codec
    (H.264 etc.) would go.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError(
            "real video decode implemented for MJPEG-in-AVI only; plug an "
            "ffmpeg codec here — the batching/schema contract is final"
        )
    width = height = fps = 0
    handler_ok = False
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, fps, handler_ok
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = pos + 8
            if fourcc == b"LIST":
                kind = buf[body : body + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body + 4, body + size)
            elif fourcc == b"avih":
                vals = struct.unpack("<10I", buf[body : body + 40])
                if vals[0]:
                    fps = round(1_000_000 / vals[0])
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                if buf[body : body + 4] == b"vids":
                    if buf[body + 4 : body + 8] != b"MJPG":
                        raise NotImplementedError(
                            f"video handler {buf[body + 4:body + 8]!r} not "
                            "supported: MJPG only (interframe codecs are the "
                            "documented boundary)"
                        )
                    handler_ok = True
            elif fourcc[2:4] in (b"dc", b"db"):
                # compare against the REAL buffer, not the declared LIST
                # extent — a truncated file keeps its declared sizes intact
                if body + size > min(end, len(buf)):
                    raise ValueError("malformed AVI: truncated frame chunk")
                frames.append(bytes(buf[body : body + size]))
            pos = body + size + (size % 2)

    walk(data, 12, len(data))
    if not handler_ok or width <= 0 or height <= 0:
        raise ValueError("malformed AVI: missing MJPG vids stream or geometry")
    return width, height, fps, frames


def video_features(data: bytes, dim: int) -> list[float]:
    """Actual video statistics from a decoded MJPEG AVI: [n_frames/1000,
    fps/60, w/4096, h/4096, duration_s/60 (capped), first/mid/last-frame
    mean luminance/255, 8-bin mean-luminance-over-frames histogram] —
    genuinely a function of every decoded frame."""
    w, h, fps, payloads = avi_decode_mjpeg(data)
    n = len(payloads)
    if n == 0:
        # a structurally valid container with an empty movi LIST — fail the
        # same way other malformed media does, not with a bare IndexError
        raise ValueError("malformed AVI: MJPG stream with zero video frames")
    means = []
    for fw, fh, ch, px in jpeg_decode_batch(payloads):
        npx = fw * fh
        lum = sum(
            sum(px[j * ch + c] for c in range(ch)) // ch for j in range(npx)
        ) / npx
        means.append(lum)
    dur = n / fps if fps else 0.0
    feats = [
        min(n / 1000.0, 1.0),
        fps / 60.0,
        w / 4096.0,
        h / 4096.0,
        min(dur / 60.0, 1.0),
        means[0] / 255.0,
        means[n // 2] / 255.0,
        means[-1] / 255.0,
    ]
    hist = [0] * 8
    for m in means:
        hist[min(int(m / 255.0 * 8), 7)] += 1
    feats.extend(b / n for b in hist)
    feats = feats[:dim]
    feats.extend(0.0 for _ in range(dim - len(feats)))
    return feats


def mjpeg_frame_sample_stats(df, id_col: str = "doc_id", every_n: int = 2):
    """Drive the REAL video path end-to-end inside a distributed Arrow
    kernel: per row, derive four flat 16x16 grayscale frames from the md5
    digest of the id (one level per frame — at quality 100 a flat frame is
    DC-only and the lossy JPEG codec round-trips it BIT-EXACTLY), encode
    each frame with functions.jpeg, wrap them in a real AVI container with
    :func:`avi_encode_mjpeg`, then DECODE the container back, sample every
    ``every_n``-th frame, and fully decode the sampled frames.

    One output row per SAMPLED frame: (doc_id, frame_idx, px_sum, px_min,
    px_max, n_frames, fps, roundtrip_ok) — every stat reproducible hex-pair
    by hex-pair by a SQL oracle, which is what makes a video codec
    correctness-gateable. This is frame sampling as a production pipeline
    runs it: container parse once, entropy-decode ONLY the sampled frames.

    The flat-frame JPEG ENCODES are memoized per level (r12 — the exact
    :func:`video_fingerprint63` pattern, 256 possible flat frames per task),
    so the measured kernel cost is the container walk + the honest DECODE
    of the sampled frames; the synth/encode side is fixture scaffolding a
    real corpus replaces with stored bytes anyway. Measured 3.6x/doc.
    """
    from collections.abc import Iterator

    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("px_sum", LongType()),
            StructField("px_min", LongType()),
            StructField("px_max", LongType()),
            StructField("n_frames", LongType()),
            StructField("fps", LongType()),
            StructField("roundtrip_ok", BooleanType()),
        ]
    )

    def kernel(batches: Iterator):
        import hashlib

        import pandas as pd

        flat_jpeg: dict[int, bytes] = {}  # level -> encoded flat frame

        def enc(lv: int) -> bytes:
            f = flat_jpeg.get(lv)
            if f is None:
                f = flat_jpeg[lv] = jpeg_encode(
                    16, 16, 1, bytes([lv]) * 256, quality=100
                )
            return f

        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                levels = hashlib.md5(f"{int(did)}:vf".encode()).digest()[:4]
                frames = [enc(lv) for lv in levels]
                avi = avi_encode_mjpeg(16, 16, frames, fps=10)
                w, h, fps, payloads = avi_decode_mjpeg(avi)
                ok_container = (w, h, fps, len(payloads)) == (16, 16, 10, 4)
                sample_idx = list(range(0, len(payloads), every_n))
                decoded = jpeg_decode_batch([payloads[i] for i in sample_idx])
                for idx, (dw, dh, ch, px) in zip(sample_idx, decoded):
                    ok = (
                        ok_container
                        and (dw, dh, ch) == (16, 16, 1)
                        and px == bytes([levels[idx]]) * 256
                    )
                    rows.append(
                        (
                            int(did),
                            idx,
                            int(sum(px)),
                            int(min(px)),
                            int(max(px)),
                            len(payloads),
                            fps,
                            bool(ok),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col).mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# Perceptual video near-dup fingerprint (frame-level temporal signature)
# ---------------------------------------------------------------------------

VIDEO_FRAMES = 64  # frames per clip -> 63 temporal delta bits


def video_levels(did: int) -> bytes:
    """Deterministic 64-frame luminance track for document ``did`` with
    built-in near-dup structure — the video member of the fixture family
    (images: dhash_pixels, audio: audio_ulaw_bytes):

    - documents with ``did % 20 == 7`` all carry the SAME "trailer" clip
      (intros/outros/ad rolls — the boilerplate-video cohort whose
      identical fingerprints blow up quadratically, governed by the capped
      twin);
    - the rest form groups of 4 (seed ``did // 4``) where members with
      ``did % 4 != 0`` replace ONE frame's level (index ``did % 64`` —
      distinct frames within a group since the 4 ids are consecutive): a
      re-cut/inserted frame. One changed level flips at most the 2 delta
      bits adjacent to that frame -> pair Hamming <= 4 within a group, so
      radius-4 banded search recovers every group pair by pigeonhole.

    Each frame of the synthesized clip is FLAT at its level — at JPEG
    quality 100 a flat frame is DC-only and round-trips bit-exactly, which
    is what lets the fingerprint carry a DuckDB oracle through a lossy
    codec (the video_frames_sample argument, composed with dedup).
    """
    jingle = did % 20 == 7
    seed = "trailer" if jingle else str(did // 4)
    levels = bytearray()
    for c in range(VIDEO_FRAMES // 16):
        levels += hashlib.md5(f"{seed}:vid:{c}".encode()).digest()
    if not jingle and did % 4 != 0:
        levels[did % VIDEO_FRAMES] = hashlib.md5(f"{did}:pert".encode()).digest()[0]
    return bytes(levels)


def videofp63_of_levels(levels: bytes) -> int:
    """63-bit temporal delta fingerprint of a per-frame luminance track:
    bit ``f`` is set iff ``level[f] > level[f+1]`` (strict; ties clear) —
    the scene-change signature shape (TMK/temporal-hash family) with the
    per-frame statistic being the exact mean luminance, integer-exact on
    both engines."""
    if len(levels) != VIDEO_FRAMES:
        raise ValueError(f"expected {VIDEO_FRAMES} frame levels, got {len(levels)}")
    fp = 0
    for f in range(VIDEO_FRAMES - 1):
        if levels[f] > levels[f + 1]:
            fp |= 1 << f
    return fp


def video_fingerprint63(df, id_col: str = "doc_id"):
    """Per-document 63-bit perceptual video fingerprint with the REAL
    MJPEG-AVI codec chain in the loop: synthesize the 64-frame flat clip
    (:func:`video_levels`), JPEG-encode every frame at quality 100
    (functions.jpeg — flat frames are DC-only, bit-exact), wrap them in a
    real AVI container (:func:`avi_encode_mjpeg`), then parse the container
    back and entropy-decode EVERY frame (:func:`avi_decode_mjpeg` +
    jpeg_decode) and fingerprint the DECODED frame levels. The oracle
    rebuilds the levels hex-pair by hex-pair from the same md5 seeds, so
    parity proves the container+JPEG+hash chain bit-exact —
    video_frames_sample's codec proof composed with dedup, completing
    near-dup across all four modalities (text simhash64, image dhash,
    audio energy-delta, video here).

    mapInPandas Arrow kernel, map-side only; the flat-frame JPEG encodes
    are memoized per level (256 possible flat frames), so the measured
    kernel cost is the honest DECODE path (container walk + 64 per-frame
    entropy decodes per clip). At a real corpus the synth step is replaced
    by reading the video binary column and the per-frame statistic by a
    real luminance mean over sampled frames — schema, banding, cap, and
    verify contracts unchanged. Output: (id, vfp), LongType both (integral
    id contract, as image_dhash63/audio_fingerprint63).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import IntegralType, LongType, StructField, StructType

    if not isinstance(df.schema[id_col].dataType, IntegralType):
        raise TypeError(
            f"video_fingerprint63 requires an integral id column; "
            f"{id_col!r} is {df.schema[id_col].dataType.simpleString()}"
        )
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("vfp", LongType(), False),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        flat_jpeg: dict[int, bytes] = {}  # level -> encoded flat frame

        def enc(lv: int) -> bytes:
            f = flat_jpeg.get(lv)
            if f is None:
                f = flat_jpeg[lv] = jpeg_encode(8, 8, 1, bytes([lv]) * 64, quality=100)
            return f

        for pdf in batches:
            ids = []
            fps = []
            for did in pdf[id_col]:
                did = int(did)
                levels = video_levels(did)
                avi = avi_encode_mjpeg(8, 8, [enc(lv) for lv in levels], fps=10)
                w, h, _fps, payloads = avi_decode_mjpeg(avi)
                if (w, h, len(payloads)) != (8, 8, VIDEO_FRAMES):
                    raise ValueError(
                        f"AVI round trip returned {w}x{h}/{len(payloads)} "
                        f"frames for doc {did}"
                    )
                # one batched decode per clip: shared header parse + one
                # cross-frame IDCT pass (jpeg_decode_batch; bit-identical
                # to per-frame jpeg_decode, test-pinned) — measured 4.1x
                # over 64 independent decodes on the clip shape
                back = bytes(d[3][0] for d in jpeg_decode_batch(payloads))
                ids.append(did)
                fps.append(videofp63_of_levels(back))
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"),
                 "vfp": pd.Series(fps, dtype="int64")}
            )

    from ..session import ensure_parallelism

    # the codec kernel is the CPU cost — spread a one-row-group scan across
    # cores before it (no-op at the thousands-of-files 100 TB layout)
    return ensure_parallelism(df.select(id_col)).mapInPandas(kernel, schema)


def duckdb_video_fingerprint63(table: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`video_fingerprint63` — rebuilds the 64 frame
    levels hex-pair by hex-pair from the same md5 seeds (trailer / group /
    perturbation rules identical) and assembles the 63 temporal delta bits
    with exact integer arithmetic. No codec on this side: flat frames at
    quality 100 round-trip losslessly through the JPEG+AVI chain, so
    level-identical input implies fingerprint-identical output — which
    makes this an oracle on the Spark side's container+JPEG+hash chain."""
    digests = ",\n               ".join(
        f"md5(seed || ':vid:{c}') AS h{c}" for c in range(VIDEO_FRAMES // 16)
    )
    levels = ",\n               ".join(
        f"CASE WHEN pert AND pf = {f} THEN pv "
        f"ELSE ('0x' || substr(h{f // 16}, {2 * (f % 16) + 1}, 2))::BIGINT END AS l{f}"
        for f in range(VIDEO_FRAMES)
    )
    bits = " + ".join(
        f"CASE WHEN l{f} > l{f + 1} "
        f"THEN CAST({1 << f} AS BIGINT) ELSE 0 END"
        for f in range(VIDEO_FRAMES - 1)
    )
    return f"""
        SELECT id, CAST({bits} AS BIGINT) AS vfp FROM (
            SELECT id, {levels}
            FROM (
                SELECT {id_col} AS id,
                       CASE WHEN {id_col} % 20 = 7 THEN 'trailer'
                            ELSE CAST({id_col} // 4 AS VARCHAR) END AS seed,
                       ({id_col} % 20 <> 7 AND {id_col} % 4 <> 0) AS pert,
                       {id_col} % {VIDEO_FRAMES} AS pf,
                       ('0x' || substr(md5({id_col}::VARCHAR || ':pert'), 1, 2))::BIGINT AS pv,
                       {digests}
                FROM {table}
            )
        )
    """
