"""Event-stream operators — the windowed/streaming custom-operator class
(SURVEY.md §2.9 notes the reference has no data-streaming semantics; these
are the engine's batch realization of the two canonical stream shapes):

- :func:`windowed_event_counts` — tumbling-window aggregate: per
  (user, 1-hour window) event count + value sum. Expressed as a stateless
  ``map_batches`` key projection + one multi-key ``groupby().aggregate``
  shuffle — Ray's hash aggregate does map-side partial combining, so the
  exchange carries one row per (user, window) per block, not per event.
- :func:`sessionize_events` — gap-based sessionization (new session when
  the within-user gap exceeds ``gap_us``). Needs every user's events
  co-located and time-ordered: ``groupby(user_id).map_groups`` with a fully
  vectorized body (sort + diff + reduceat — no per-event Python). The
  partitioning assumption this relies on: sessions never span users, so
  hash-partitioning by ``user_id`` is a complete exchange; per-user volume
  bounds group memory (salt/split a pathological single-user firehose by
  time range BEFORE this stage if one user exceeds a block).

All arithmetic is integer (epoch microseconds; value summed in floored
micro-units) so the DuckDB oracles compare value-exactly — float addition
order never enters the result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

HOUR_US = 3_600_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _epoch_us(col) -> np.ndarray:
    """timestamp column → int64 epoch microseconds (exact)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()


def windowed_event_counts(
    events: ray.data.Dataset, *, window_us: int = HOUR_US
) -> ray.data.Dataset:
    """Tumbling-window aggregate: (user_id, hour_idx, n_events,
    sum_value_micros). ``hour_idx`` = epoch_us // window; value is floored
    to integer micro-units per event before summing (order-independent,
    SQL-exact)."""

    def project(batch: pa.Table) -> pa.Table:
        t = _epoch_us(batch["ts"])
        col = batch["value"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        if col.null_count:
            # NULL values contribute 0 to the sum (SQL SUM ignores NULLs);
            # without this a null→NaN→astype(int64) lands at INT64_MIN and
            # silently corrupts sum_value_micros
            import pyarrow.compute as pc

            v = np.where(
                pc.is_valid(col).to_numpy(zero_copy_only=False), v, 0.0
            )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hour_idx": pa.array(t // window_us),
                "value_micros": pa.array(
                    np.floor(v * 1e6).astype(np.int64)
                ),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    agg = (
        events.map_batches(project, batch_format="pyarrow")
        .groupby(["user_id", "hour_idx"])
        .sum(["one", "value_micros"])
    )
    return agg.rename_columns(
        {"sum(one)": "n_events", "sum(value_micros)": "sum_value_micros"}
    )


def sessionize_events(
    events: ray.data.Dataset, *, gap_us: int = SESSION_GAP_US
) -> ray.data.Dataset:
    """Gap-based sessions: per user, events ordered by (ts, event_id); a
    new session starts when the gap from the previous event exceeds
    ``gap_us``. Emits one row per session: (user_id, session_idx (1-based
    in time order), n_events, start_us, end_us)."""

    def sessions(group: pa.Table) -> pa.Table:
        t = _epoch_us(group["ts"])
        eid = group["event_id"].to_numpy()
        uid = group["user_id"][0].as_py()
        order = np.lexsort((eid, t))
        ts = t[order]
        # session boundaries: first event, or gap > gap_us
        new_s = np.ones(ts.shape[0], dtype=bool)
        if ts.shape[0] > 1:
            new_s[1:] = np.diff(ts) > gap_us
        starts = np.flatnonzero(new_s)
        n_ev = np.diff(np.append(starts, ts.shape[0]))
        ends = np.append(starts[1:], ts.shape[0]) - 1
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(starts.shape[0], uid, dtype=np.int64)
                ),
                "session_idx": pa.array(
                    np.arange(1, starts.shape[0] + 1, dtype=np.int64)
                ),
                "n_events": pa.array(n_ev.astype(np.int64)),
                "start_us": pa.array(ts[starts]),
                "end_us": pa.array(ts[ends]),
            }
        )

    return events.select_columns(["event_id", "ts", "user_id"]).groupby(
        "user_id"
    ).map_groups(sessions, batch_format="pyarrow")


SLIDE_US = 15 * 60 * 1_000_000  # 15-minute hop


def sliding_window_counts(
    events: ray.data.Dataset,
    *,
    window_us: int = HOUR_US,
    slide_us: int = SLIDE_US,
) -> ray.data.Dataset:
    """Sliding (hopping) window aggregate: per (user, window) event count +
    integer-micro value sum, where window ``w`` covers
    ``[w·slide, w·slide + window)`` and ``window = k·slide`` (``k`` must be
    integral — validated). An event at time ``t`` therefore belongs to the
    ``k`` windows ``t//slide − (k−1) … t//slide``.

    Scale shape — explode AFTER combining, not before: events are first
    pre-aggregated per (user, base slide bucket) INSIDE each batch (pure
    numpy lexsort+reduceat, no shuffle), then each bucket row is exploded
    into the k windows it feeds, then one multi-key ``groupby().sum``
    shuffles k × distinct-(user, bucket) rows per block — independent of
    the per-bucket event count, k× the tumbling operator's exchange rather
    than k× the event count.
    """
    if window_us % slide_us:
        raise ValueError("window_us must be an integer multiple of slide_us")
    k = window_us // slide_us

    def bucket_explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _epoch_us(batch["ts"])
        col = batch["value"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        if col.null_count:
            v = np.where(pc.is_valid(col).to_numpy(zero_copy_only=False), v, 0.0)
        vm = np.floor(v * 1e6).astype(np.int64)
        uid = batch["user_id"].to_numpy()
        b = t // slide_us
        # per-batch combine: one (user, bucket) partial per distinct pair
        order = np.lexsort((b, uid))
        us, bs, vs = uid[order], b[order], vm[order]
        new = np.ones(us.shape[0], dtype=bool)
        new[1:] = (us[1:] != us[:-1]) | (bs[1:] != bs[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, us.shape[0]))
        vsum = np.add.reduceat(vs, starts) if us.shape[0] else np.empty(0, np.int64)
        # explode each partial into the k windows its bucket feeds
        gu = np.repeat(us[starts], k)
        gw = np.repeat(bs[starts], k) - np.tile(np.arange(k, dtype=np.int64), starts.shape[0])
        gc = np.repeat(cnt.astype(np.int64), k)
        gv = np.repeat(vsum, k)
        return pa.table(
            {
                "user_id": pa.array(gu),
                "window_idx": pa.array(gw),
                "one": pa.array(gc),
                "value_micros": pa.array(gv),
            }
        )

    agg = (
        events.select_columns(["user_id", "ts", "value"])
        .map_batches(bucket_explode, batch_format="pyarrow")
        .groupby(["user_id", "window_idx"])
        .sum(["one", "value_micros"])
    )
    return agg.rename_columns(
        {"sum(one)": "n_events", "sum(value_micros)": "sum_value_micros"}
    )


def _tag_and_union(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Shared two-sided co-location scaffolding for the join-shaped event
    operators: project both sides to (key, id, t_us, side) metadata rows
    and union them; the caller co-locates with ONE ``groupby(key_col)``.
    Partitioning assumption (same as :func:`sessionize_events`): matches
    never cross keys, so hash-partitioning by key is a complete exchange."""

    def project(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: batch[key_col],
                    id_col: batch[id_col],
                    "t_us": pa.array(_epoch_us(batch["ts"])),
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8)
                    ),
                }
            )

        return fn

    return left.map_batches(project(0), batch_format="pyarrow").union(
        right.map_batches(project(1), batch_format="pyarrow")
    )


def _split_sides(
    group: pa.Table, key_col: str, id_col: str
) -> tuple[object, np.ndarray, np.ndarray, np.ndarray]:
    """(key, left times, left ids, SORTED right times) of one co-located
    group."""
    key = group[key_col][0].as_py()
    t = group["t_us"].to_numpy()
    side = group["side"].to_numpy()
    ids = group[id_col].to_numpy()
    return key, t[side == 0], ids[side == 0], np.sort(t[side == 1])


def _empty_group(key_col: str, id_col: str, out_col: str) -> pa.Table:
    return pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "t_us": pa.array([], pa.int64()),
            out_col: pa.array([], pa.int64()),
        }
    )


def asof_prev_ts(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """AS-OF join (the trades⟕quotes shape, SURVEY custom-operator class):
    for every LEFT event, the latest RIGHT event time ≤ its own time within
    the same key — ``(event_id, user_id, t_us, prev_ts_us)`` with
    ``prev_ts_us = -1`` when no earlier right event exists (a sentinel,
    not null: epoch timestamps are non-negative, and a non-null column
    keeps the driver's value-hash comparison exact — NaN ≠ NaN).

    The match value is the timestamp itself (unique by construction as a
    max), not a right row id — identical right timestamps per key would
    make a row-id choice nondeterministic on both engines.

    Shape: both sides are projected to (key, id, t, side) metadata rows,
    unioned, and co-located by ONE ``groupby(key)`` shuffle; the per-key
    body is a vectorized sort + ``np.searchsorted`` (no per-event Python).
    Partitioning assumption: matches never cross keys, so hash-partitioning
    by ``key_col`` is a complete exchange — the same contract as
    :func:`sessionize_events`.
    """

    tagged = _tag_and_union(left, right, key_col, id_col)

    def merge(group: pa.Table) -> pa.Table:
        key, lt, lid, rt = _split_sides(group, key_col, id_col)
        if lt.shape[0] == 0:
            return _empty_group(key_col, id_col, "prev_ts_us")
        if rt.shape[0] == 0:
            # a key with left events but NO right events: every row gets
            # the -1 sentinel (an eager rt[...] gather here would IndexError
            # on the empty array — regression-tested)
            prev = np.full(lt.shape[0], -1, dtype=np.int64)
        else:
            idx = np.searchsorted(rt, lt, side="right") - 1
            matched = idx >= 0
            prev = np.where(matched, rt[np.maximum(idx, 0)], -1)
        return pa.table(
            {
                id_col: pa.array(lid.astype(np.int64)),
                key_col: pa.array(np.full(lt.shape[0], key, dtype=np.int64)),
                "t_us": pa.array(lt),
                "prev_ts_us": pa.array(prev, pa.int64()),
            }
        )

    return tagged.groupby(key_col).map_groups(merge, batch_format="pyarrow")


RANGE_DELTA_US = 5 * 60 * 1_000_000  # ±5 min


def range_join_counts(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    delta_us: int = RANGE_DELTA_US,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """RANGE join, count-aggregated (the burst-detection shape): for every
    LEFT event, how many RIGHT events of the same key lie within
    ``±delta_us`` of it — ``(event_id, user_id, t_us, n_within)``.

    Emitting the COUNT rather than the pair list keeps the output linear
    in the left side (a raw range join is quadratic inside dense bursts);
    the per-key body is two ``np.searchsorted`` probes over the sorted
    right timestamps. Same co-location contract as :func:`asof_prev_ts`:
    one ``groupby(key)`` shuffle, matches never cross keys.
    """

    tagged = _tag_and_union(left, right, key_col, id_col)

    def count_within(group: pa.Table) -> pa.Table:
        key, lt, lid, rt = _split_sides(group, key_col, id_col)
        if lt.shape[0] == 0:
            return _empty_group(key_col, id_col, "n_within")
        # searchsorted on an empty rt returns 0 for both probes → count 0
        lo = np.searchsorted(rt, lt - delta_us, side="left")
        hi = np.searchsorted(rt, lt + delta_us, side="right")
        return pa.table(
            {
                id_col: pa.array(lid.astype(np.int64)),
                key_col: pa.array(np.full(lt.shape[0], key, dtype=np.int64)),
                "t_us": pa.array(lt),
                "n_within": pa.array((hi - lo).astype(np.int64)),
            }
        )

    return tagged.groupby(key_col).map_groups(count_within, batch_format="pyarrow")


DEDUP_WINDOW_US = 60 * 60 * 1_000_000  # 1-hour debounce window


def event_dedup_stats(
    events: ray.data.Dataset, *, window_us: int = DEDUP_WINDOW_US
) -> ray.data.Dataset:
    """Streaming debounce-dedup accounting — the at-least-once-delivery
    dedup rule of streaming systems: within each (user, event_type) stream
    ordered by (ts, event_id), an event is a *near-time duplicate* when it
    follows the previous event of the same key within ``window_us`` (the
    LAG-gap rule, exactly SQL-expressible so the oracle checks value for
    value). Emits (user_id, event_type, n_events, n_dups), sorted.

    Scale shape: one user-keyed hash shuffle co-locates each user's stream
    (the sessionize_events shape); the per-group body is one lexsort +
    vectorized diff over (type, ts, id) — no per-event Python. Null-ts
    events are excluded (oracle ``WHERE ts IS NOT NULL``).

    Reference parity: the same skip-what-you-just-saw rule as the
    reference's incremental rescan (only changed files are re-hashed,
    ``/root/reference/Api/Implementations/DuplicatesByHash/
    DuplicateByHashFinder.cs:29-77`` via the signature cache), applied to
    an event stream on a time window.
    """

    def dedupe(group: pa.Table) -> pa.Table:
        ts_col = group["ts"]
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        valid = pc.is_valid(ts_col)
        group = group.filter(valid)
        if group.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "n_dups": pa.array([], pa.int64()),
                }
            )
        t = _epoch_us(group["ts"])
        eid = group["event_id"].to_numpy()
        uid = group["user_id"][0].as_py()
        types = np.asarray(group["event_type"].to_pylist(), dtype=object)
        tcodes_all, tcode = np.unique(types, return_inverse=True)
        order = np.lexsort((eid, t, tcode))
        st, su = tcode[order], t[order]
        dup = np.zeros(st.shape[0], dtype=bool)
        if st.shape[0] > 1:
            dup[1:] = (st[1:] == st[:-1]) & ((su[1:] - su[:-1]) < window_us)
        n = tcodes_all.shape[0]
        n_events = np.bincount(tcode, minlength=n).astype(np.int64)
        n_dups = np.bincount(st[dup], minlength=n).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(np.full(n, uid, dtype=np.int64)),
                "event_type": pa.array(tcodes_all, pa.string()),
                "n_events": pa.array(n_events),
                "n_dups": pa.array(n_dups),
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "event_type"])
        .groupby("user_id")
        .map_groups(dedupe, batch_format="pyarrow")
        .sort(["user_id", "event_type"])
    )
