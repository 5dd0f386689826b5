"""Property tests for the pure kernels added in round 5: the streaming
top-k board fold (streaming/topk.py) and the integer rank-mapping /
apportionment arithmetic. No Spark session needed — these pin the
algebra the distributed queries rely on."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_log_watcher_spark.streaming.topk import _fold_board

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # value_milli (ties likely)
        st.integers(min_value=0, max_value=9),  # user_id
    ),
    min_size=0,
    max_size=30,
)


def _mk(vals, eid0):
    return pd.DataFrame(
        {
            "value_milli": [v for v, _ in vals],
            "event_id": list(range(eid0, eid0 + len(vals))),
            "user_id": [u for _, u in vals],
        }
    )


@settings(max_examples=200, deadline=None)
@given(batches=st.lists(rows, min_size=1, max_size=5), k=st.integers(1, 5))
def test_incremental_fold_equals_global_topk(batches, k):
    # fold batch-by-batch (what the stateful processor does)
    board = []
    eid = 0
    all_rows = []
    for b in batches:
        all_rows.extend(
            (v, e, u) for (v, u), e in zip(b, range(eid, eid + len(b)))
        )
        board = _fold_board(board, _mk(b, eid), k)
        eid += len(b)
    # equals the batch top-k over everything seen, under the exact
    # (value DESC, event_id ASC) order — the replay-split-invariance
    # theorem the streaming query's resolution depends on
    want = sorted(all_rows, key=lambda t: (-t[0], t[1]))[:k]
    assert board == want


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1,
                   max_size=30),
    budget=st.integers(min_value=1, max_value=5_000),
)
def test_largest_remainder_apportionment_algebra(sizes, budget):
    # the integer algebra source_quota_apportion executes in SQL
    total = sum(sizes)
    floors = [n * budget // total for n in sizes]
    rems = [n * budget % total for n in sizes]
    short = budget - sum(floors)
    order = sorted(range(len(sizes)), key=lambda i: (-rems[i], i))
    quotas = list(floors)
    for i in order[:short]:
        quotas[i] += 1
    assert sum(quotas) == budget  # the LR guarantee, for ANY input
    for q, f_, n in zip(quotas, floors, sizes):
        assert q in (f_, f_ + 1)
        assert abs(q - n * budget / total) < 1.0


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=100_000),
    m=st.integers(min_value=1, max_value=1000),
    r=st.integers(min_value=1, max_value=1000),
)
def test_quantile_normalize_index_algebra(n, m, r):
    # the all-int64 round-half-up index map source_quantile_normalize
    # executes: within-source rank r of m maps into [1, n], monotone
    if r > m:
        r = m
    def gidx(rank):
        if m == 1:
            return 1
        return (2 * (rank - 1) * (n - 1) + (m - 1)) // (2 * (m - 1)) + 1
    g = gidx(r)
    assert 1 <= g <= n
    assert gidx(1) == 1
    if m > 1:
        assert gidx(m) == n  # extremes pin to extremes
    # a single-element source maps to the global minimum by the CASE
    if r > 1:
        assert gidx(r - 1) <= g  # monotone in rank
    # round-half-up of the real-valued map
    if m > 1:
        exact = (r - 1) * (n - 1) / (m - 1)
        assert abs((g - 1) - exact) <= 0.5
