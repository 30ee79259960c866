"""Accumulator property tests: merge-associativity and oracle agreement
(SURVEY.md §5: 'property tests for accumulator merge-associativity')."""

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_ray.state import TDigest, Welford


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_welford_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(100, 15, 10_000)
    w = Welford().add_array(v)
    assert np.isclose(w.mean, v.mean())
    assert np.isclose(w.stddev_pop, v.std(ddof=0))
    assert w.vmin == v.min() and w.vmax == v.max()
    assert w.n == v.size


def test_welford_merge_equals_single_pass():
    rng = np.random.default_rng(7)
    v = rng.normal(0, 1, 30_000)
    single = Welford().add_array(v)
    # merge in an arbitrary topology: 13 uneven chunks, pairwise-merged
    chunks = np.array_split(v, 13)
    accs = [Welford().add_array(c) for c in chunks]
    while len(accs) > 1:
        accs = [accs[i].merge(accs[i + 1]) if i + 1 < len(accs) else accs[i]
                for i in range(0, len(accs), 2)]
    merged = accs[0]
    assert merged.n == single.n
    assert np.isclose(merged.mean, single.mean)
    assert np.isclose(merged.m2, single.m2)


def test_welford_nulls_and_roundtrip():
    v = np.array([1.0, np.nan, 3.0, np.nan])
    w = Welford().add_array(v, nulls=2)
    assert w.n == 2 and w.nulls == 2 and w.null_rate == 0.5
    w2 = Welford.from_dict(w.to_dict())
    assert w2.n == w.n and np.isclose(w2.mean, w.mean) and np.isclose(w2.m2, w.m2)


@pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform"])
def test_tdigest_quantile_accuracy(dist):
    rng = np.random.default_rng(3)
    v = getattr(rng, dist)(size=50_000)
    td = TDigest(compression=200)
    td.add_array(v)
    spread = np.quantile(v, 0.99) - np.quantile(v, 0.01)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(v, q)
        assert abs(td.quantile(q) - exact) < 0.02 * spread, (dist, q)


def test_tdigest_merge_close_to_single():
    rng = np.random.default_rng(11)
    v = rng.normal(50, 10, 40_000)
    single = TDigest(200).add_array(v)
    parts = [TDigest(200).add_array(c) for c in np.array_split(v, 16)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.n == pytest.approx(40_000)
    for q in (0.25, 0.5, 0.75):
        assert abs(merged.quantile(q) - single.quantile(q)) < 0.5, q


def test_tdigest_roundtrip():
    td = TDigest(100).add_array(np.arange(1000.0))
    td2 = TDigest.from_dict(td.to_dict())
    assert td2.quantile(0.5) == td.quantile(0.5)
    assert td2.n == td.n


# --------------------------------------------------------------------------
# DedupIndex / DedupShard (vectorized LSM runs + per-tick idempotency)
# --------------------------------------------------------------------------

def test_dedup_index_first_wins_and_resize(ray_session):
    from use_case_real_time_anomaly_detection_ray.state import dedup_index

    idx = dedup_index.DedupIndex(n_shards=2)
    rng = np.random.default_rng(7)
    # enough batches/keys to cross the initial capacity → rehash path runs;
    # key range includes 0 (the scalar-side sentinel special case)
    all_seen: set[int] = set()
    for b in range(20):
        h = rng.integers(0, 5_000, 1_000).astype(np.uint64)
        mask = idx.filter_new(h, tick=f"t{b}")
        # oracle: sequential first-occurrence over the global stream
        want = np.empty(len(h), bool)
        seen = set(all_seen)
        for i, k in enumerate(h.tolist()):
            want[i] = k not in seen
            seen.add(k)
        assert (mask == want).all(), b
        all_seen = seen
    assert idx.size() == len(all_seen)


def test_dedup_index_retry_idempotent(ray_session):
    """A re-executed (batch, tick) — Ray retry / lineage reconstruction —
    must get the SAME keep mask back, not see its own keys as dupes."""
    from use_case_real_time_anomaly_detection_ray.state import dedup_index

    idx = dedup_index.DedupIndex(n_shards=2)
    h1 = np.array([10, 20, 30, 20], np.uint64)   # in-batch dup of 20
    m1 = idx.filter_new(h1, tick="t1")
    assert m1.tolist() == [True, True, True, False]
    # same tick re-sends the identical batch → identical mask
    assert idx.filter_new(h1, tick="t1").tolist() == m1.tolist()
    # a LATER tick probing the same keys sees them all as dupes
    assert idx.filter_new(h1, tick="t2").tolist() == [False] * 4
    # new key in the retry-safe tick still admits
    assert idx.filter_new(np.array([40], np.uint64), tick="t1").tolist() == [True]
    assert idx.size() == 4


def test_dedup_index_tick_is_required(ray_session):
    """A constant default tick would silently disable cross-batch dedup
    (owned-by-this-tick re-admission); the label must be explicit."""
    from use_case_real_time_anomaly_detection_ray.state.dedup_index import (
        DedupIndex,
    )

    idx = DedupIndex(n_shards=1)
    with pytest.raises(TypeError):
        idx.filter_new(np.array([1], np.uint64))
