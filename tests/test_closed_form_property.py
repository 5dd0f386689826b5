"""Property tests for the round-6 closed-form rewrites: every algebraic
shortcut the distributed queries rely on is pinned against the literal
definition on random inputs. No Spark session needed — these test the
ALGEBRA (the CUSUM empty-prefix bug was exactly this class of defect,
caught by the sf-fixture variant of these checks)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

ints = st.integers(min_value=-(10**6), max_value=10**6)
series = st.lists(ints, min_size=1, max_size=60)


# ---------------------------------------------------------------------------
# CUSUM: prefix-extrema closed form == the sequential recurrence
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(series)
def test_cusum_closed_form_equals_recurrence(xs):
    # recurrence (the definition)
    s_pos = s_neg = 0
    folded = []
    for x in xs:
        s_pos = max(0, s_pos + x)
        s_neg = max(0, s_neg - x)
        folded.append((s_pos, s_neg))
    # closed form (what the query computes): P_t - min(0, prefix-min P)
    p = pmin = pmax = 0
    closed = []
    for x in xs:
        p += x
        pmin = min(pmin, p)
        pmax = max(pmax, p)
        closed.append((p - pmin, pmax - p))
    assert folded == closed


# ---------------------------------------------------------------------------
# Skyline: bucketed two-phase prune == NOT EXISTS dominance
# ---------------------------------------------------------------------------


pts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5000),  # cents
        st.integers(min_value=0, max_value=300),  # day
    ),
    min_size=1,
    max_size=80,
)


@settings(max_examples=300, deadline=None)
@given(pts, st.integers(min_value=1, max_value=7))
def test_skyline_bucket_decomposition_is_exact(ps, bucket_width):
    # per-cents group max (the query's grp relation)
    best: dict[int, int] = {}
    for c, d in ps:
        best[c] = max(best.get(c, -1), d)
    # definition: non-dominated
    expect = {
        (c, d)
        for c, d in best.items()
        if all(hd < d for hc, hd in best.items() if hc > c)
    }
    # bucketed two-phase (the query's plan): prefix max over strictly
    # higher buckets + running max within the bucket over higher cents
    got = set()
    buckets: dict[int, list] = {}
    for c, d in best.items():
        buckets.setdefault(c // bucket_width, []).append((c, d))
    bmax = {b: max(d for _, d in v) for b, v in buckets.items()}
    for b, v in buckets.items():
        above = max(
            (m for hb, m in bmax.items() if hb > b), default=-1
        )
        for c, d in v:
            inmax = max(
                (hd for hc, hd in v if hc > c), default=-1
            )
            if d > max(above, inmax):
                got.add((c, d))
    assert got == expect


# ---------------------------------------------------------------------------
# Weighted median: histogram cumulative rule == sorted expansion
# ---------------------------------------------------------------------------


witems = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # value
        st.integers(min_value=1, max_value=9),  # weight
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=300, deadline=None)
@given(witems)
def test_weighted_median_histogram_rule(items):
    # definition: lower weighted median of the expanded multiset
    expanded = sorted(v for v, w in items for _ in range(w))
    tot = len(expanded)
    lower_median = expanded[(tot + 1) // 2 - 1]
    # the query's rule: least value with 2*cumw >= total on the histogram
    hist: dict[int, int] = {}
    for v, w in items:
        hist[v] = hist.get(v, 0) + w
    cum = 0
    for v in sorted(hist):
        cum += hist[v]
        if 2 * cum >= tot:
            got = v
            break
    assert got == lower_median


# ---------------------------------------------------------------------------
# Two-sample KS: integer cross-multiplied deviation == float definition
# ---------------------------------------------------------------------------


two_samples = st.tuples(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
)


@settings(max_examples=300, deadline=None)
@given(two_samples)
def test_ks_integer_deviation_matches_definition(samples):
    xs, ys = samples
    na, nb = len(xs), len(ys)
    support = sorted(set(xs) | set(ys))
    # integer form (the query): max |cumA*nB - cumB*nA|
    ca = cb = 0
    best = -1
    for v in support:
        ca += sum(1 for x in xs if x == v)
        cb += sum(1 for y in ys if y == v)
        best = max(best, abs(ca * nb - cb * na))
    # definition: sup |F_A - F_B| over the merged support
    ca = cb = 0
    d = 0.0
    for v in support:
        ca += sum(1 for x in xs if x == v)
        cb += sum(1 for y in ys if y == v)
        d = max(d, abs(ca / na - cb / nb))
    # equality up to the exact rational scaling
    assert best == round(d * na * nb) or abs(best - d * na * nb) < 1e-6
