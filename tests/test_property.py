"""Property-based tests (hypothesis) — an upgrade over the reference's
purely example-based strategy (SURVEY §5): codec round-trips, SNR floors,
t-digest quantile ordering, LCG decimation."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from unify_spark.audio import pcm
from unify_spark.operators import tdigest as td

int16s = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=4000
)


@settings(max_examples=30, deadline=None)
@given(int16s)
def test_lossless_roundtrip_any_signal(vals):
    x = np.array(vals, dtype="<i2")
    for codec in ("pcm_s16le", "flac"):
        assert (pcm.decode(pcm.encode(x, codec), codec) == x).all()


@settings(max_examples=30, deadline=None)
@given(int16s)
def test_lossy_roundtrip_bounded_error(vals):
    x = np.array(vals, dtype="<i2")
    # mu-law worst-case quantization step at full scale is < 2048;
    # the 12-bit stand-in's step is 16
    u = pcm.decode(pcm.encode(x, "ulaw"), "ulaw")
    assert np.abs(u.astype(np.int32) - x.astype(np.int32)).max() <= 2048
    m = pcm.decode(pcm.encode(x, "mp3"), "mp3")
    assert np.abs(m.astype(np.int32) - x.astype(np.int32)).max() <= 16
    # A-law: top segment (7) quantization step is 2^11, so worst-case
    # error stays under half that plus the mid-rise offset
    a = pcm.decode(pcm.encode(x, "alaw"), "alaw")
    err = np.abs(a.astype(np.int32) - x.astype(np.int32))
    assert err.max() <= 2048
    # companding monotonicity: re-encoding the decode is a fixed point
    assert pcm.encode(a, "alaw") == pcm.encode(x, "alaw")


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**9),
    st.sampled_from([8000, 16000, 48000]),
    st.integers(min_value=1, max_value=3000),
    st.sampled_from([2, 3, 4, 7]),
)
def test_strided_synth_is_exact_decimation(index, sr, n, stride):
    idx = np.array([index])
    full = pcm.synth_pcm16_batch(idx, sr, n)
    strided = pcm.synth_pcm16_strided_batch(idx, sr, n, stride)
    assert (strided == full[:, ::stride]).all()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=10, max_size=5000)
)
def test_tdigest_quantiles_monotone_and_bounded(vals):
    v = np.array(vals)
    d = td.build(v)
    qs = [td.quantile(d, q) for q in (0.1, 0.25, 0.5, 0.75, 0.9)]
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))  # monotone
    assert v.min() - 1e-9 <= qs[0] and qs[-1] <= v.max() + 1e-9  # bounded


# --- constraint-family properties (Spark plans vs a Python reference) -------
# one DataFrame per test (hypothesis generates the row set once per example,
# capped small so Spark round-trips stay fast)

import pytest  # noqa: E402


@pytest.fixture(scope="module")
def pspark():
    from unify_spark.session import get_spark

    return get_spark("prop-tests", master="local[4]", shuffle_partitions=4)


_texts = st.lists(
    st.one_of(st.none(), st.text(alphabet="ABXY z.,!", max_size=20)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(_texts)
def test_char_domain_matches_python_reference(pspark, vals):
    from unify_spark.operators.base import ValidationContext
    from unify_spark.operators.constraints import RegexConstraint

    df = pspark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "clip_id int, s string"
    )
    c = RegexConstraint.char_domain("t", "s", "ABXY z.,!"[:4])  # alphabet ABXY
    got = {r["key"] for r in c.violations({"t": df}, ValidationContext()).collect()}
    want = {
        str(i)
        for i, v in enumerate(vals)
        if v is not None and any(ch not in "ABXY" for ch in v)
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_texts, st.integers(min_value=0, max_value=12))
def test_length_cap_matches_python_reference(pspark, vals, cap):
    from unify_spark.operators.base import ValidationContext
    from unify_spark.operators.constraints import LengthConstraint

    df = pspark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "clip_id int, s string"
    )
    c = LengthConstraint("t", "s", max_len=cap)
    got = {r["key"] for r in c.violations({"t": df}, ValidationContext()).collect()}
    want = {str(i) for i, v in enumerate(vals) if v is not None and len(v) > cap}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(allow_nan=False, min_value=-5, max_value=5)),
            st.one_of(st.none(), st.floats(allow_nan=False, min_value=-5, max_value=5)),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_any_present_matches_python_reference(pspark, rows):
    from unify_spark.operators.base import ValidationContext
    from unify_spark.operators.constraints import AnyPresentConstraint

    df = pspark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "clip_id int, a double, b double",
    )
    c = AnyPresentConstraint("t", ["a", "b"])
    got = {r["key"] for r in c.violations({"t": df}, ValidationContext()).collect()}
    want = {str(i) for i, (a, b) in enumerate(rows) if a is None and b is None}
    assert got == want


# -- deterministic hash sampling (pure-Python mirror of the Column predicate) --

import hashlib

from unify_spark.functions.sampling import hash_threshold


def _member(identifier, rate: float, salt: str = "") -> bool:
    # exact mirror of sampling.hash_keep: md5(id||salt) 8-hex prefix < threshold
    if rate >= 1.0:
        return True
    h = hashlib.md5((str(identifier) + salt).encode()).hexdigest()[:8]
    return h < hash_threshold(rate)


@settings(max_examples=50, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0), st.floats(min_value=0.0, max_value=1.0))
def test_hash_threshold_monotone_and_wellformed(r1, r2):
    t1, t2 = hash_threshold(r1), hash_threshold(r2)
    assert len(t1) == 8 and t1 == t1.lower()
    if r1 <= r2:
        assert t1 <= t2


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=200),
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_hash_sample_membership_nests(ids, ra, rb):
    """For any two rates, the lower-rate sample is a subset of the
    higher-rate one — the no-churn property of threshold sampling."""
    lo, hi = min(ra, rb), max(ra, rb)
    for i in ids:
        if _member(i, lo):
            assert _member(i, hi)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=200))
def test_hash_sample_rate_bounds(ids):
    """rate=0 keeps nothing, rate=1 keeps everything, and distinct salts
    give genuinely different predicates on a big enough id set."""
    assert not any(_member(i, 0.0) for i in ids)
    assert all(_member(i, 1.0) for i in ids)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),
            st.integers(min_value=0, max_value=3_000),  # seconds offset
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([60, 300, 900]),  # gap seconds
)
def test_sessionize_matches_python_reference(pspark, events, gap_s):
    """session_window semantics vs a straight O(n) reference sessionizer:
    per key, sort event times; a new session starts when the delta from the
    previous event EXCEEDS the gap (two events exactly gap apart still
    merge — their [t, t+gap) windows touch, and Spark merges touching
    windows; hypothesis found this boundary); session end = last event +
    gap. The Spark rollup must agree on every (key, start, end, n_events)."""
    from datetime import datetime, timedelta

    from unify_spark.functions.sessions import sessionize

    base = datetime(2025, 3, 1)
    rows = [(k, base + timedelta(seconds=s)) for k, s in events]
    df = pspark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, "ts", "user_id", gap=f"{gap_s} seconds").collect()
    }

    want = set()
    by_key: dict = {}
    for k, ts in rows:
        by_key.setdefault(k, []).append(ts)
    for k, times in by_key.items():
        times.sort()
        start, prev, n = times[0], times[0], 1
        for t in times[1:]:
            if (t - prev).total_seconds() > gap_s:
                want.add((k, start, prev + timedelta(seconds=gap_s), n))
                start, n = t, 0
            prev = t
            n += 1
        want.add((k, start, prev + timedelta(seconds=gap_s), n))
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", ""]), min_size=0, max_size=6),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_boilerplate_lines_matches_python_reference(pspark, docs, min_df):
    """remove_boilerplate_lines vs an O(n) reference: count distinct-doc
    frequency of each non-blank trimmed line; drop lines at/over the bar
    from every doc, preserving order; blanks always survive."""
    from collections import Counter

    from unify_spark.functions.text import remove_boilerplate_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = pspark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, "doc_id", "text", min_doc_freq=min_df).collect()
    }

    freq = Counter()
    for _i, lines in enumerate(docs):
        for ln in {l.strip() for l in lines if l.strip()}:
            freq[ln] += 1
    hot = {ln for ln, n in freq.items() if n >= min_df}
    for i, lines in enumerate(docs):
        want = "\n".join(l for l in lines if not (l.strip() and l.strip() in hot))
        assert got[i] == want, (i, lines, got[i], want)


@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=10_000),
)
def test_wilson_interval_properties(k, n):
    from unify_spark.functions.sampling import wilson_interval

    if k > n:
        k, n = n, k  # need k <= n
    lo, hi = wilson_interval(k, n)
    assert 0.0 <= lo <= hi <= 1.0
    if n > 0:
        assert lo <= k / n <= hi  # the band always contains the point estimate
        # monotone in k at fixed n (both endpoints)
        if k < n:
            lo2, hi2 = wilson_interval(k + 1, n)
            assert lo2 >= lo - 1e-12 and hi2 >= hi - 1e-12
        # more trials -> never a wider band at the same observed rate
        lo4, hi4 = wilson_interval(4 * k, 4 * n)
        assert (hi4 - lo4) <= (hi - lo) + 1e-12
