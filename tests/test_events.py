"""Event-stream operators: tumbling-window aggregate + sessionization vs
brute-force truth on a hand-built stream (SQL parity lives in
tests/test_entry.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.pipelines.events import (
    HOUR_US,
    SESSION_GAP_US,
    sessionize_events,
    windowed_event_counts,
)

_MIN = 60 * 1_000_000


def _mk_events():
    """Two users; user 1 has three sessions (gaps of 31 and 45 min), user 2
    one session spanning an hour boundary; a duplicate timestamp checks the
    (ts, event_id) tie order."""
    rows = [
        # (event_id, t_us, user_id, value)
        (1, 10 * _MIN, 1, 1.25),
        (2, 15 * _MIN, 1, 2.50),
        (3, 15 * _MIN, 1, 0.75),       # duplicate ts, tie-broken by id
        (4, 46 * _MIN + 1, 1, 1.00),   # gap 31min+1us → new session
        (5, 60 * _MIN, 1, 4.00),       # same session (14min gap)
        (6, 105 * _MIN + 1, 1, 0.10),  # gap 45min+1us → new session
        (7, 55 * _MIN, 2, 9.99),
        (8, 70 * _MIN, 2, 0.01),       # crosses hour boundary, 15min gap
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["x"] * len(rows)),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def test_windowed_event_counts(ray_session):
    import ray.data

    got = windowed_event_counts(ray.data.from_arrow(_mk_events())).to_pandas()
    rows = {
        (r.user_id, r.hour_idx): (r.n_events, r.sum_value_micros)
        for r in got.itertuples()
    }
    # event 5 sits exactly on the hour boundary (60min = HOUR_US → idx 1)
    assert rows == {
        (1, 0): (4, 5_500_000),
        (1, 1): (2, 4_100_000),
        (2, 0): (1, 9_990_000),
        (2, 1): (1, 10_000),
    }


def test_windowed_counts_match_bruteforce(ray_session):
    import ray.data

    t = _mk_events()
    got = windowed_event_counts(ray.data.from_arrow(t)).to_pandas()
    want: dict[tuple, list] = {}
    for eid, ts, uid, val in zip(
        t["event_id"].to_pylist(),
        t["ts"].cast(pa.int64()).to_pylist(),
        t["user_id"].to_pylist(),
        t["value"].to_pylist(),
    ):
        k = (uid, ts // HOUR_US)
        want.setdefault(k, [0, 0])
        want[k][0] += 1
        want[k][1] += int(np.floor(val * 1e6))
    assert {
        (r.user_id, r.hour_idx): [r.n_events, r.sum_value_micros]
        for r in got.itertuples()
    } == want


def test_sessionize_events(ray_session):
    import ray.data

    got = sessionize_events(ray.data.from_arrow(_mk_events())).to_pandas()
    by_user = {
        u: sorted(
            zip(g.session_idx, g.n_events, g.start_us, g.end_us)
        )
        for u, g in got.groupby("user_id")
    }
    assert by_user[1] == [
        (1, 3, 10 * _MIN, 15 * _MIN),
        (2, 2, 46 * _MIN + 1, 60 * _MIN),
        (3, 1, 105 * _MIN + 1, 105 * _MIN + 1),
    ]
    assert by_user[2] == [(1, 2, 55 * _MIN, 70 * _MIN)]
    # boundary exactness: a gap of exactly SESSION_GAP_US does NOT split
    t2 = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                np.array([0, SESSION_GAP_US], dtype="datetime64[us]")
            ),
            "user_id": pa.array([5, 5], pa.int64()),
        }
    )
    g2 = sessionize_events(ray.data.from_arrow(t2)).to_pandas()
    assert len(g2) == 1 and g2.n_events.iloc[0] == 2


def test_windowed_counts_null_values(ray_session):
    """Regression (round-4 advice): a NULL value used to become NaN →
    astype(int64) → INT64_MIN, corrupting sum_value_micros. NULLs now
    contribute 0 to the sum (SQL SUM semantics) but still count as events."""
    import ray.data

    t = _mk_events()
    vals = t["value"].to_pylist()
    vals[1] = None  # event 2: user 1, hour 0, was 2.50
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa.array(vals, pa.float64()))
    got = windowed_event_counts(ray.data.from_arrow(t)).to_pandas()
    rows = {
        (r.user_id, r.hour_idx): (r.n_events, r.sum_value_micros)
        for r in got.itertuples()
    }
    assert rows == {
        (1, 0): (4, 3_000_000),  # 5.5M minus the nulled 2.5M; count unchanged
        (1, 1): (2, 4_100_000),
        (2, 0): (1, 9_990_000),
        (2, 1): (1, 10_000),
    }


def test_sliding_window_planted(ray_session):
    """An event at t belongs to exactly window/slide hopping windows; sums
    and counts verified against a hand model."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.events import sliding_window_counts

    us = 1_000_000
    t0 = 10_000 * 900 * us  # aligned to a slide boundary
    rows = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "ts": pa.array(
                np.array([t0, t0 + 900 * us, t0], dtype="datetime64[us]")
            ),
            "value": pa.array([1.5, 2.25, 0.5], pa.float64()),
        }
    )
    out = (
        sliding_window_counts(
            ray.data.from_arrow(rows),
            window_us=3600 * us,
            slide_us=900 * us,
        )
        .to_pandas()
        .set_index(["user_id", "window_idx"])
        .sort_index()
    )
    b = t0 // (900 * us)
    # user 7: event A in windows b-3..b, event B in b-2..b+1
    for w in range(b - 3, b + 2):
        n = (1 if b - 3 <= w <= b else 0) + (1 if b - 2 <= w <= b + 1 else 0)
        got = out.loc[(7, w)]
        assert got.n_events == n
        want_sum = (1_500_000 if b - 3 <= w <= b else 0) + (
            2_250_000 if b - 2 <= w <= b + 1 else 0
        )
        assert got.sum_value_micros == want_sum
    assert out.loc[(8, b)].n_events == 1
    assert len(out.loc[8]) == 4


def test_sliding_window_validates_slide(ray_session):
    import pytest
    import ray.data
    import pyarrow as pa

    from europa_ray.pipelines.events import sliding_window_counts

    t = pa.table({"event_id": [1], "user_id": [1], "ts": [0], "value": [0.0]})
    with pytest.raises(ValueError, match="multiple"):
        sliding_window_counts(
            ray.data.from_arrow(t), window_us=100, slide_us=33
        )


def test_asof_prev_ts_planted(ray_session):
    """Hand-modeled as-of join: ties (right at exactly left's time) match;
    no earlier right event → -1 sentinel; keys never cross."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.events import asof_prev_ts

    def ev(ids, users, ts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "user_id": pa.array(users, pa.int64()),
                    "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
                }
            )
        )

    left = ev([1, 3, 5, 7], [10, 10, 10, 20], [100, 205, 300, 50])
    right = ev([2, 4, 6], [10, 10, 20], [100, 200, 60])
    out = (
        asof_prev_ts(left, right)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[1].prev_ts_us == 100   # tie: rt == lt matches
    assert out.loc[3].prev_ts_us == 200
    assert out.loc[5].prev_ts_us == 200
    assert out.loc[7].prev_ts_us == -1    # user 20's right event is later
    assert len(out) == 4


def test_range_join_counts_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.events import range_join_counts

    def ev(ids, users, ts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "user_id": pa.array(users, pa.int64()),
                    "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
                }
            )
        )

    left = ev([1, 3, 5], [10, 10, 20], [1000, 5000, 1000])
    right = ev([2, 4, 6], [10, 10, 20], [900, 1100, 9000])
    out = (
        range_join_counts(left, right, delta_us=150)
        .to_pandas().set_index("event_id").sort_index()
    )
    assert out.loc[1].n_within == 2   # 900 and 1100 within ±150 of 1000
    assert out.loc[3].n_within == 0   # zero-neighbor left row KEPT
    assert out.loc[5].n_within == 0   # user isolation: 9000 is user 20's but too far
    assert len(out) == 3


def test_asof_left_only_key(ray_session):
    """Regression: a key whose events are ALL on the left side must get
    the -1 sentinel, not an IndexError from gathering into the empty
    right-timestamp array."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.events import asof_prev_ts

    def ev(ids, users, ts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "user_id": pa.array(users, pa.int64()),
                    "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
                }
            )
        )

    left = ev([1, 3], [30, 30], [100, 200])   # user 30: left-only
    right = ev([2], [10], [50])               # right events for user 10 only
    out = asof_prev_ts(left, right).to_pandas().set_index("event_id").sort_index()
    assert list(out.prev_ts_us) == [-1, -1]


def test_event_dedup_stats(ray_session):
    """Debounce-dedup: hand-built (user, type) streams with a 20-min
    window — same-type gaps under/over the window, a cross-type
    interleave that must NOT suppress, and a null-ts row excluded."""
    import ray.data

    from europa_ray.pipelines.events import event_dedup_stats

    rows = [
        # (event_id, t_us or None, user_id, type)
        (1, 0, 1, "a"),
        (2, 10 * _MIN, 1, "a"),        # 10min after #1 → dup
        (3, 15 * _MIN, 1, "b"),        # different type → not a dup
        (4, 40 * _MIN, 1, "a"),        # 30min after #2 → kept
        (5, 41 * _MIN, 1, "a"),        # 1min after #4 → dup
        (6, None, 1, "a"),             # null ts → excluded
        (7, 0, 2, "a"),                # other user, singleton
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [None if r[1] is None else r[1] for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
        }
    )
    got = event_dedup_stats(
        ray.data.from_arrow(t).repartition(3), window_us=20 * _MIN
    ).to_pandas()
    assert list(map(tuple, got.values.tolist())) == [
        (1, "a", 4, 2),
        (1, "b", 1, 0),
        (2, "a", 1, 0),
    ]
