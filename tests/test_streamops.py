"""Edge-case pins for the event-stream operators (`pipelines/streamops.py`):
gap boundaries, equal-timestamp as-of ties, unmatched left rows, empty
strata — the corners the driver-scale oracles may not exercise."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from use_case_real_time_anomaly_detection_ray.pipelines import streamops as SO


def _events(rows):
    """rows: (event_id, user_id, ts_us, event_type, value)"""
    eid, uid, ts, et, val = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(list(ts), pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
    }))


US = 1_000_000


def test_sessionize_gap_boundary(ray_session):
    """A gap EXACTLY equal to gap_us does NOT break the session (> not >=,
    matching the SQL); one microsecond more does."""
    gap = SO.SESSION_GAP_US
    ds = _events([
        (1, 7, 0, "view", 1.0),
        (2, 7, gap, "view", 2.0),            # exactly gap later: same session
        (3, 7, 2 * gap + 1, "view", 3.0),    # gap+1 later: new session
    ]).drop_columns(["event_type"])
    out = SO.sessionize(ds).to_pandas().sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)
    assert out["session_id"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [2, 1]
    assert out["sum_value"].tolist() == [3.0, 3.0]


def test_sessionize_per_user_ids_restart(ray_session):
    ds = _events([
        (1, 1, 0, "v", 1.0), (2, 1, 10**13, "v", 1.0),
        (3, 2, 5, "v", 1.0),
    ]).drop_columns(["event_type"])
    out = SO.sessionize(ds).to_pandas()
    by_user = out.groupby("user_id")["session_id"].max()
    assert by_user[1] == 2 and by_user[2] == 1  # ids restart per user


def test_asof_equal_ts_matches(ray_session):
    """A right row at EXACTLY the left timestamp matches (<= semantics)."""
    left = _events([(1, 3, 1000, "p", 0.0)]).drop_columns(
        ["event_type", "value"])
    right = _events([(9, 3, 1000, "v", 0.0)]).select_columns(
        ["user_id", "ts"])
    out = SO.asof_join(left, right).to_pandas()
    assert len(out) == 1 and out.loc[0, "gap_us"] == 0


def test_asof_unmatched_is_null(ray_session):
    left = _events([(1, 3, 1000, "p", 0.0),
                    (2, 4, 2000, "p", 0.0)]).drop_columns(
        ["event_type", "value"])
    right = _events([(9, 3, 1500, "v", 0.0)]).select_columns(
        ["user_id", "ts"])   # after user 3's event; user 4 has none
    out = SO.asof_join(left, right).to_pandas().sort_values("event_id")
    assert out["matched_ts"].isna().all()
    assert out["gap_us"].isna().all()


def test_asof_picks_latest_not_first(ray_session):
    left = _events([(1, 3, 10 * US, "p", 0.0)]).drop_columns(
        ["event_type", "value"])
    right = _events([(8, 3, 2 * US, "v", 0.0),
                     (9, 3, 7 * US, "v", 0.0),
                     (10, 3, 11 * US, "v", 0.0)]).select_columns(
        ["user_id", "ts"])
    out = SO.asof_join(left, right).to_pandas()
    assert out.loc[0, "gap_us"] == 3 * US  # matched the 7s row, not 2s/11s


def test_tumbling_distinct_users_across_blocks(ray_session):
    """The same user appearing in many blocks counts ONCE per window."""
    rows = [(i, i % 3, (i % 2) * SO._US_PER_HOUR, "click", 1.0)
            for i in range(60)]
    ds = _events(rows).repartition(8)
    out = SO.tumbling_agg(ds).to_pandas().sort_values("window_start")
    assert (out["n_users"] == 3).all()
    assert out["n_events"].sum() == 60
    assert (out["sum_value"] == out["n_events"] * 1.0).all()


def test_hash_sample_deterministic_and_stratified(ray_session):
    import hashlib

    t = pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "lang": pa.array((["en", "zh"] * 200), pa.string()),
        "source": pa.array(["s"] * 400, pa.string()),
        "n_chars": pa.array([1] * 400, pa.int64()),
    })
    out1 = SO.hash_sample(ray.data.from_arrow(t)).to_pandas()
    out2 = SO.hash_sample(ray.data.from_arrow(t)).to_pandas()
    pd.testing.assert_frame_equal(out1, out2)       # deterministic
    # exact membership recompute
    for _, r in out1.iterrows():
        hv = int.from_bytes(
            hashlib.md5(str(r.doc_id).encode()).digest()[:4], "big")
        cut = (SO.SAMPLE_THRESHOLDS.get(r.lang, SO.SAMPLE_DEFAULT_THRESHOLD))
        assert hv < cut
    # en stratum keeps ~2x the zh stratum
    n_en = (out1.lang == "en").sum()
    n_zh = (out1.lang == "zh").sum()
    assert n_en > n_zh > 0


def test_range_join_boundary_semantics(ray_session):
    """Window is (ts - 1h, ts]: a view exactly 1h before is excluded, a view
    exactly at the purchase timestamp is included."""
    H = SO._US_PER_HOUR
    left = _events([(1, 5, 2 * H, "p", 0.0)]).drop_columns(
        ["event_type", "value"])
    right = _events([(8, 5, H, "v", 0.0),          # exactly 1h before: OUT
                     (9, 5, H + 1, "v", 0.0),      # just inside: IN
                     (10, 5, 2 * H, "v", 0.0),     # equal ts: IN
                     (11, 5, 2 * H + 1, "v", 0.0)  # after: OUT
                     ]).select_columns(["user_id", "ts"])
    out = SO.range_join_count(left, right).to_pandas()
    assert out.loc[0, "n_in_window"] == 2


def test_range_join_no_cross_user_bleed(ray_session):
    """User A's lookback reaching before their first event must not count
    user B's rows (the composite-key clamp)."""
    H = SO._US_PER_HOUR
    # force both users into ONE bucket so the composite key is exercised
    left = _events([(1, 1, 10, "p", 0.0),
                    (2, 2, 10, "p", 0.0)]).drop_columns(
        ["event_type", "value"])
    right = _events([(8, 1, 5, "v", 0.0),
                     (9, 2, 5, "v", 0.0),
                     (10, 2, 6, "v", 0.0)]).select_columns(["user_id", "ts"])
    out = (SO.range_join_count(left, right, lookback_us=H, num_buckets=1)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out["n_in_window"].tolist() == [1, 2]


def test_range_join_zero_matches(ray_session):
    left = _events([(1, 5, 10**12, "p", 0.0)]).drop_columns(
        ["event_type", "value"])
    right = _events([(8, 6, 10**12, "v", 0.0)]).select_columns(
        ["user_id", "ts"])
    out = SO.range_join_count(left, right).to_pandas()
    assert out.loc[0, "n_in_window"] == 0


def test_cents_rejects_nulls(ray_session):
    """A null `value` must fail loudly, not corrupt an integer-cents sum
    (SQL SUM would silently skip the NULL — divergence either way)."""
    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([0, 1], pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array([1.0, None], pa.float64()),
    })
    with pytest.raises(Exception, match="null `value`"):
        SO.sessionize(ray.data.from_arrow(t)).materialize()


def test_cap_per_key_deterministic_and_layout_invariant(ray_session):
    """At most k rows per key; the picked set is a function of md5(id) only
    — identical across block layouts — and matches a pandas reference."""
    import hashlib

    import pandas as pd

    from use_case_real_time_anomaly_detection_ray.pipelines import streamops

    rng = np.random.default_rng(15)
    n = 400
    df = pd.DataFrame({"event_id": rng.permutation(10_000)[:n].astype("int64"),
                       "user_id": rng.integers(0, 25, n).astype("int64")})
    want = df.assign(samp_h=[hashlib.md5(str(x).encode()).hexdigest()
                             for x in df["event_id"]])
    want = (want.sort_values(["samp_h", "event_id"], kind="mergesort")
            .groupby("user_id", sort=False).head(3))
    want = (want.sort_values("event_id").reset_index(drop=True)
            [["event_id", "user_id", "samp_h"]])
    for split in (2, 7):
        ds = ray.data.from_pandas([df.iloc[i::split] for i in range(split)])
        got = (streamops.cap_per_key(ds, "user_id", k=3, id_col="event_id")
               .to_pandas().sort_values("event_id").reset_index(drop=True)
               [["event_id", "user_id", "samp_h"]])
        pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert got.groupby("user_id").size().le(3).all()


def test_temperature_sample_rebalances_and_is_deterministic(ray_session):
    """alpha<1 upsamples the small source: its realized keep-fraction must
    exceed the big source's; output is layout-invariant and md5-exact."""
    import hashlib

    big = 9000
    small = 300
    tab = pa.table({
        "doc_id": pa.array(range(big + small), pa.int64()),
        "source": pa.array(["big"] * big + ["small"] * small),
    })
    ds1 = ray.data.from_arrow(tab).repartition(7)
    ds2 = ray.data.from_arrow(tab).repartition(2)
    a = SO.temperature_sample(ds1, alpha=0.3, target_frac=0.5).to_pandas()
    b = SO.temperature_sample(ds2, alpha=0.3, target_frac=0.5).to_pandas()
    key = ["doc_id", "source"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True),
        b.sort_values(key, ignore_index=True))
    fr = a.groupby("source").size()
    # exact thresholds, brute-force recomputed
    n = np.array([big, small], np.float64)
    ws = np.power(n, 0.3)
    fs = np.minimum(1.0, 0.5 * n.sum() * ws / ws.sum() / n)
    fs = np.floor(fs * 1e6 + 0.5) / 1e6
    cuts = dict(zip(["big", "small"], (np.floor(fs * 2**32)).astype(np.int64)))
    for src, lo, hi in (("big", 0, big), ("small", big, big + small)):
        want = sum(
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
            < cuts[src]
            for i in range(lo, hi))
        assert fr.get(src, 0) == want
    # rebalancing: the small source keeps a larger fraction than the big one
    assert fr["small"] / small > fr["big"] / big
    # and the big source is actually subsampled
    assert fr["big"] < big


def test_window_funnel_semantics(ray_session):
    """Hand-built funnel cases: full progression, window cutoff, equal-ts
    progression, step-order enforcement, absent step-1 users."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def T(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        # u1: view@0 click@1 purchase@2 -> level 3
        (1, T(0), "view"), (1, T(1), "click"), (1, T(2), "purchase"),
        # u2: view@0 click@1 purchase@100 (beyond 48h window) -> level 2
        (2, T(0), "view"), (2, T(1), "click"), (2, T(100), "purchase"),
        # u3: purchase@0 click@1 view@2 (wrong order after first view) -> 1
        (3, T(0), "purchase"), (3, T(1), "click"), (3, T(2), "view"),
        # u4: equal timestamps progress (>= semantics) -> level 3
        (4, T(5), "view"), (4, T(5), "click"), (4, T(5), "purchase"),
        # u5: no view at all -> no output row
        (5, T(0), "click"), (5, T(1), "purchase"),
        # u6: view@0 then click beyond window@50 -> level 1
        (6, T(0), "view"), (6, T(50), "click"), (6, T(51), "purchase"),
    ]
    tab = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    ds = ray.data.from_arrow(tab).repartition(3)
    got = (SO.window_funnel(ds, ("view", "click", "purchase"),
                            window_us=48 * 3_600_000_000)
           .to_pandas().set_index("user_id").sort_index())
    assert got.index.tolist() == [1, 2, 3, 4, 6]
    assert got["funnel_level"].tolist() == [3, 2, 1, 3, 1]
    assert got.loc[1, "t_first"] == T(0)
    assert got.loc[4, "t_first"] == T(5)


def test_hopping_windows_vs_tumbling_and_coverage(ray_session):
    """Every event lands in exactly window/hop hopping windows; the hopping
    aggregate restricted to hop == window equals tumbling; cross-block
    distinct users fold exactly."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append((i, t0 + dt.timedelta(minutes=7 * i), "view",
                     100 + i % 3, 1.5 * i))
    tab = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "user_id": pa.array([r[3] for r in rows], pa.int64()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    ds = ray.data.from_arrow(tab).repartition(4)
    W, H = 2 * 3_600_000_000, 3_600_000_000
    hop = SO.tumbling_agg(ds, window_us=W, hop_us=H).to_pandas()
    # coverage: every event appears in exactly W/H = 2 windows
    assert hop["n_events"].sum() == 2 * len(rows)
    # hop == window degenerates to tumbling
    a = (SO.tumbling_agg(ds, window_us=W, hop_us=W).to_pandas()
         .sort_values(["window_start", "event_type"], ignore_index=True))
    b = (SO.tumbling_agg(ds, window_us=W).to_pandas()
         .sort_values(["window_start", "event_type"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    # brute-force one hopping window: [t0, t0+2h) holds minutes 0..119 -> 18 events
    w0 = hop[hop["window_start"] == t0]
    assert int(w0["n_events"].iloc[0]) == 18
    assert int(w0["n_users"].iloc[0]) == 3
    # invalid hop rejected
    with pytest.raises(ValueError):
        SO.tumbling_agg(ds, window_us=W, hop_us=7)


def test_json_field_agg_null_semantics(ray_session):
    """Missing/unparsable props and absent fields count toward n but not
    the stats; all-missing groups carry null min/max; sums are exact."""
    tab = pa.table({
        "event_type": pa.array(["a", "a", "a", "b", "b", "c"]),
        "props": pa.array(['{"k": 5}', '{"k": -2}', "not json",
                           '{"other": 1}', None, '{"k": 7}']),
    })
    ds = ray.data.from_arrow(tab).repartition(3)
    got = (SO.json_field_agg(ds).to_pandas()
           .set_index("event_type").sort_index())
    assert got.loc["a", "n"] == 3 and got.loc["a", "n_with"] == 2
    assert got.loc["a", "sum_v"] == 3
    assert got.loc["a", "min_v"] == -2 and got.loc["a", "max_v"] == 5
    assert got.loc["b", "n"] == 2 and got.loc["b", "n_with"] == 0
    assert got.loc["b", "sum_v"] == 0
    assert pd.isna(got.loc["b", "min_v"]) and pd.isna(got.loc["b", "max_v"])
    assert got.loc["c", "n_with"] == 1 and got.loc["c", "sum_v"] == 7


def test_json_field_agg_robustness(ray_session):
    """Big ints survive exactly (no pandas float64 round-trip), NULL group
    keys form their own group, and non-string group columns work."""
    big = 2**62 + 1
    tab = pa.table({
        "event_type": pa.array(["a", "a", None]),
        "props": pa.array([f'{{"k": {big}}}', '{"other": 1}', '{"k": 3}']),
    })
    got = SO.json_field_agg(ray.data.from_arrow(tab).repartition(2)).to_pandas()
    a = got[got.event_type == "a"].iloc[0]
    assert int(a["min_v"]) == big and int(a["max_v"]) == big
    assert int(a["sum_v"]) == big and int(a["n_with"]) == 1
    nullg = got[got.event_type.isna()]
    assert len(nullg) == 1 and int(nullg["sum_v"].iloc[0]) == 3
    # int64 group column
    tab2 = pa.table({
        "user_id": pa.array([7, 7, 9], pa.int64()),
        "props": pa.array(['{"k": 1}', '{"k": 2}', None]),
    })
    got2 = (SO.json_field_agg(ray.data.from_arrow(tab2), group_col="user_id")
            .to_pandas().set_index("user_id").sort_index())
    assert got2.loc[7, "sum_v"] == 3 and got2.loc[9, "n_with"] == 0


def test_tumbling_two_level_fold_paths_identical(ray_session):
    """The two-level (window, type, user-subbucket) distinct fold must be
    bitwise-identical to the single-shuffle fold — both tumbling and
    hopping, across several subbucket widths (the GATES_DRIVER_BELOW
    forced-path pattern)."""
    rng = np.random.default_rng(5)
    n = 4_000
    t = pa.table({
        "ts": pa.array(rng.integers(0, 20 * 3_600_000_000, n),
                       pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["view", "click", "buy"], n)),
        "user_id": pa.array(rng.integers(0, 300, n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    ds = ray.data.from_arrow(t).repartition(5)

    def run(**kw):
        return (SO.tumbling_agg(ds, **kw).to_pandas()
                .sort_values(["window_start", "event_type"],
                             ignore_index=True))

    for kw in ({}, {"window_us": 2 * 3_600_000_000,
                    "hop_us": 3_600_000_000}):
        single = run(user_subbuckets=1, **kw)
        for s in (4, 8, 32):
            pd.testing.assert_frame_equal(run(user_subbuckets=s, **kw),
                                          single)
        # the module default (16) is the two-level path
        pd.testing.assert_frame_equal(run(**kw), single)
    with pytest.raises(ValueError):
        SO.tumbling_agg(ds, user_subbuckets=0)


def test_sessionize_partial_runs_path_identical(ray_session):
    """The partial_runs scale path (per-block run folds + interval-union
    stitch) must be bitwise-identical to the single-shuffle path across
    block layouts — clustered timestamps so multi-event runs exist and
    runs from different blocks interleave (the forced-path pattern)."""
    rng = np.random.default_rng(11)
    n = 3_000
    base = rng.integers(0, 5 * 86400 * US, n)
    ts = np.concatenate([base, base[: n // 2]
                         + rng.integers(0, SO.SESSION_GAP_US * 3, n // 2)])
    m = len(ts)
    t = pa.table({
        "event_id": pa.array(np.arange(m), pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 40, m), pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 50, m), 2)),
    })
    key = ["user_id", "session_id"]
    for blocks in (1, 3, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        single = SO.sessionize(ds).to_pandas().sort_values(
            key, ignore_index=True)
        part = SO.sessionize(ds, partial_runs=True).to_pandas().sort_values(
            key, ignore_index=True)
        pd.testing.assert_frame_equal(part, single)


def test_sessionize_partial_runs_nested_blocks(ray_session):
    """Cross-block run NESTING: block B's lone event falls inside block A's
    run interval, and a third run attaches through the merged end — the
    interval-union sweep must chain all of them (previous-row end alone
    would split). Plus the exact-gap boundary across blocks."""
    gap = SO.SESSION_GAP_US

    def blk(rows):
        eid, ts = zip(*rows)
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(list(ts), pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([7] * len(rows), pa.int64()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }))

    # block A: one run [0, 2·gap] (internal deltas == gap: no break);
    # block B: an event at gap/2 (inside A's interval) and one at
    # 3·gap + 1 — exactly gap past A's run end, so SAME session through
    # the union, plus a genuinely separate session at 10·gap.
    a = blk([(1, 0), (2, gap), (3, 2 * gap)])
    b = blk([(4, gap // 2), (5, 3 * gap), (6, 10 * gap)])
    ds = a.union(b)
    for kw in ({}, {"partial_runs": True}):
        out = SO.sessionize(ds, **kw).to_pandas().sort_values(
            ["user_id", "session_id"], ignore_index=True)
        assert len(out) == 2
        assert out.loc[0, "n_events"] == 5
        assert int(out.loc[0, "session_end"].value) == 3 * gap * 1_000  # ns
        assert out.loc[1, "n_events"] == 1
        assert out.loc[0, "sum_value"] == 5.0


def test_hash_sample_empty_thresholds_uses_default(ray_session):
    """thresholds={} must fall back to default_threshold for every row, not
    crash on a null-typed index_in value_set."""
    t = pa.table({"doc_id": pa.array(range(64), pa.int64()),
                  "lang": pa.array(["en", "fr"] * 32)})
    ds = ray.data.from_arrow(t)
    assert SO.hash_sample(ds, thresholds={},
                          default_threshold=2 ** 32).count() == 64
    assert SO.hash_sample(ds, thresholds={}, default_threshold=0).count() == 0
