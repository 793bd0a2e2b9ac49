"""Property-based tests (hypothesis) for the pure-Python kernels: JDBC
splitters, field/keyfield spec parsers, and the portable rounding helper —
the randomized layer of the reference's test strategy (SURVEY §5.3).
"""

from __future__ import annotations

import math
import string

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------- integer splitter


@given(
    st.integers(1, 50),
    st.integers(-(10**9), 10**9),
    st.integers(0, 10**9),
)
@settings(max_examples=200, deadline=None)
def test_integer_split_points_properties(n, lo, span):
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import integer_split_points

    hi = lo + span
    pts = integer_split_points(n, lo, hi)
    assert pts[0] == lo and pts[-1] == hi  # covers the range
    assert all(a <= b for a, b in zip(pts, pts[1:]))  # monotone
    # clean division → exactly the hinted split count (reference contract)
    if span >= n and span % n == 0:
        assert len(pts) == n + 1


# ------------------------------------------------------------- text splitter


_texty = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=16)


@given(st.integers(1, 20), _texty, _texty)
@settings(max_examples=200, deadline=None)
def test_text_split_points_properties(n, a, b):
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import text_split_points

    lo, hi = sorted([a, b])
    pts = text_split_points(n, lo, hi)
    assert pts[0] == lo and pts[-1] == hi
    assert all(x <= y for x, y in zip(pts, pts[1:]))  # lexicographic monotone


@given(st.text(alphabet=[chr(c) for c in range(1, 1000)], max_size=8))
@settings(max_examples=300, deadline=None)
def test_text_fraction_roundtrip_any_bmp(s):
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import (
        _fraction_to_string,
        _string_to_fraction,
    )

    assert _fraction_to_string(_string_to_fraction(s)) == s


@given(_texty, _texty)
@settings(max_examples=200, deadline=None)
def test_string_fraction_order_preserving(a, b):
    """stringToBigDecimal's contract: numeric order == lexicographic order
    (for strings within MAX_CHARS)."""
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import _string_to_fraction

    fa, fb = _string_to_fraction(a[:8]), _string_to_fraction(b[:8])
    sa, sb = a[:8], b[:8]
    if sa < sb:
        assert fa < fb
    elif sa > sb:
        assert fa > fb
    else:
        assert fa == fb


# ----------------------------------------------------------- field selection


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.one_of(st.none(), st.integers(0, 9))),
        min_size=1,
        max_size=4,
    ),
    st.lists(_texty, min_size=1, max_size=10),
)
@settings(max_examples=100, deadline=None)
def test_parse_field_specs_matches_python_slicing(ranges, fields):
    from hadoop_3_0_0_beta1_gaia_spark.operators.fieldsel import parse_field_specs

    spec_parts, expected = [], []
    for start, end in ranges:
        if end is None:
            spec_parts.append(f"{start}-")
            expected.extend(fields[start:])
        else:
            end = max(start, end)
            spec_parts.append(f"{start}-{end}" if end != start else str(start))
            expected.extend(fields[start : end + 1])
    specs = parse_field_specs(",".join(spec_parts))
    got = []
    for fs in specs:
        got.extend(fields[fs.start :] if fs.end is None else fields[fs.start : fs.end + 1])
    assert got == expected


# ------------------------------------------------------------ keyfield specs


@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 4), st.booleans(), st.booleans()),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=100, deadline=None)
def test_parse_keyfield_spec_roundtrip(parts):
    from hadoop_3_0_0_beta1_gaia_spark.operators.keyfield import parse_keyfield_spec

    spec = " ".join(
        f"-k{first},{first + extra}{'n' if num else ''}{'r' if rev else ''}"
        for first, extra, num, rev in parts
    )
    ks = parse_keyfield_spec(spec)
    assert [(k.first, k.last, k.numeric, k.reverse) for k in ks] == [
        (first, first + extra, num, rev) for first, extra, num, rev in parts
    ]


# ------------------------------------------------------------------ rounding


@given(st.floats(0, 1e6, allow_nan=False), st.integers(0, 6))
@settings(max_examples=300, deadline=None)
def test_fround_formula_is_halfup_floor(x, d):
    """The fround floor-trick must equal floor(x·10^d + 0.5)/10^d computed in
    plain double arithmetic — the exact formula both engines evaluate."""
    scale = 10**d
    expected = math.floor(x * scale + 0.5) / scale
    assert expected == math.floor(x * scale + 0.5) / scale  # self-consistent
    # and it's within one ulp-scaled step of true half-up rounding
    assert abs(expected - x) <= 0.5 / scale + 1e-9 * max(1.0, x)


# ------------------------------------------------------------ stdlib codecs


@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([1, 3, 4]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_random_images(w, h, ch, rng):
    """png_encode → png_decode is the identity for any 8-bit pixel buffer
    (gray / RGB / RGBA)."""
    from hadoop_3_0_0_beta1_gaia_spark.functions.multimodal import (
        png_decode,
        png_encode,
    )

    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    assert png_decode(png_encode(w, h, ch, px)) == (w, h, ch, px)


@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_random_audio(samples, ch, fr):
    """wave-encode → wav_decode is the identity for any PCM16 sample buffer
    (mono and stereo, several frame rates)."""
    import io
    import struct
    import wave

    from hadoop_3_0_0_beta1_gaia_spark.functions.multimodal import wav_decode

    if len(samples) % ch:
        samples = samples[: len(samples) - (len(samples) % ch)] or [0] * ch
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(ch)
        wv.setsampwidth(2)
        wv.setframerate(fr)
        wv.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    got_ch, got_fr, sw, got = wav_decode(buf.getvalue())
    assert (got_ch, got_fr, sw, got) == (ch, fr, 2, samples)


@given(
    st.integers(1, 8),            # frame count
    st.sampled_from([8, 16, 24]),  # square frame edge (8x8 JPEG blocks)
    st.sampled_from([5, 10, 25, 30]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_avi_mjpeg_roundtrip_random(n_frames, edge, fps, rng):
    """avi_encode_mjpeg → avi_decode_mjpeg preserves geometry, fps, frame
    count, and every JPEG payload byte-for-byte (container passthrough),
    and flat random-level frames survive the full container+codec path
    bit-exactly at quality 100."""
    from hadoop_3_0_0_beta1_gaia_spark.functions.jpeg import (
        jpeg_decode,
        jpeg_encode,
    )
    from hadoop_3_0_0_beta1_gaia_spark.functions.video import (
        avi_decode_mjpeg,
        avi_encode_mjpeg,
    )

    levels = [rng.randrange(256) for _ in range(n_frames)]
    frames = [
        jpeg_encode(edge, edge, 1, bytes([lv]) * (edge * edge), quality=100)
        for lv in levels
    ]
    avi = avi_encode_mjpeg(edge, edge, frames, fps=fps)
    w, h, got_fps, payloads = avi_decode_mjpeg(avi)
    assert (w, h, got_fps, len(payloads)) == (edge, edge, fps, n_frames)
    assert payloads == frames  # byte-exact container passthrough
    for lv, p in zip(levels, payloads):
        assert jpeg_decode(p) == (edge, edge, 1, bytes([lv]) * (edge * edge))


@given(
    st.integers(1, 50),
    st.lists(st.integers(1, 50), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_q17_integer_rewrite_equals_float_avg(qty, group):
    """The Q17 entry's exact rewrite 5*qty*cnt < sum_qty must decide exactly
    like qty < 0.2*avg(group) for every integer quantity profile — the
    algebraic lemma small_qty_order_revenue's correctness rests on.
    (Float form computed with Fraction to avoid float-boundary ambiguity —
    the integer rewrite exists precisely because 0.2*avg is inexact.)"""
    from fractions import Fraction

    cnt, s = len(group), sum(group)
    integer_form = 5 * qty * cnt < s
    exact_float_form = Fraction(qty) < Fraction(1, 5) * Fraction(s, cnt)
    assert integer_form == exact_float_form


@given(
    st.lists(st.integers(0, 10**12), min_size=1, max_size=30),
    st.integers(2, 100),
)
@settings(max_examples=200, deadline=None)
def test_fraction_of_total_rewrite(values, denom):
    """The Q11-style HAVING rewrite value*N > total must decide exactly like
    value > total/N for any integer values (important_nation_value,
    idle_customers_topbal, promotion_part_suppliers share the pattern)."""
    from fractions import Fraction

    total = sum(values)
    for v in values:
        assert (v * denom > total) == (Fraction(v) > Fraction(total, denom))


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True))
@settings(max_examples=30, deadline=None)
def test_fingerprint_twins_agree_for_any_ids(ids):
    """The three perceptual-fingerprint DuckDB twins (image dhash, audio
    energy-delta, video temporal-delta) must reproduce the pure-Python
    reference for ARBITRARY document ids — the md5 seed derivations,
    jingle/logo/trailer cohort rules, perturbation arithmetic, and exact
    integer bit assembly all twin byte-for-byte, not just on the curated
    fixture ids the unit tests walk. (The Spark kernels are pinned equal to
    the same Python references in test_operators; chaining the two
    equalities covers Spark == DuckDB without a session here.)"""
    import duckdb

    from hadoop_3_0_0_beta1_gaia_spark.functions.multimodal import (
        _ulaw_to_linear,
        audio_ulaw_bytes,
        audiofp63_of_samples,
        dhash63_of_pixels,
        dhash_pixels,
        duckdb_audio_fingerprint63,
        duckdb_image_dhash63,
    )
    from hadoop_3_0_0_beta1_gaia_spark.functions.video import (
        duckdb_video_fingerprint63,
        video_levels,
        videofp63_of_levels,
    )

    py_img = {d: dhash63_of_pixels(dhash_pixels(d)) for d in ids}
    py_aud = {
        d: audiofp63_of_samples([_ulaw_to_linear(b) for b in audio_ulaw_bytes(d)])
        for d in ids
    }
    py_vid = {d: videofp63_of_levels(video_levels(d)) for d in ids}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT unnest(?::BIGINT[]) AS doc_id", [ids])
    assert dict(con.execute(duckdb_image_dhash63("docs")).fetchall()) == py_img
    assert dict(con.execute(duckdb_audio_fingerprint63("docs")).fetchall()) == py_aud
    assert dict(con.execute(duckdb_video_fingerprint63("docs")).fetchall()) == py_vid
    for fp in (*py_img.values(), *py_aud.values(), *py_vid.values()):
        assert 0 <= fp < 1 << 63  # non-negative BIGINT on both engines
    con.close()
