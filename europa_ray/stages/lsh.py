"""LSH banding, collision detection, and in-band candidate pairing.

The analog of Europa's Qdrant ANN retrieval (``/root/reference/Api/Client/
QdrantRepository.cs:184-206``): instead of an external vector index with a
bulk-load/poll-green barrier (``SimilarImageFinder.cs:69-82``), candidates
come from a ``groupby(band_key)`` shuffle over exploded (band_key, node, sig)
rows. Verification (the score-threshold rule, ``QdrantRepository.cs:192``)
happens INSIDE the pairing function from the full 128-slot signatures carried
through the explode — fully streaming, no driver-side signature store.

Skew (north rule): bands larger than ``max_band_size`` (boilerplate/license
clusters) switch from all-pairs to sorted window pairing — a connected
spanning structure with ``pair_window`` redundancy, preserving CC
connectivity without O(n²) pair blowup; per-band pair output is additionally
capped at ``max_pairs_per_band`` (the ANN top-100 analog, K1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.functions.sig import band_keys
from europa_ray.stages.signatures import minhash_matrix, pack_sigs
from europa_ray.util import default_num_partitions

PAIRS_SCHEMA = pa.schema(
    [
        pa.field("a", pa.int64()),
        pa.field("b", pa.int64()),
        pa.field("est", pa.float64()),
        pa.field("source", pa.string()),
    ]
)


def explode_bands(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """(node, minhash) → ``lsh_bands`` rows: (band_key, node, minhash) × b."""
    n = batch.num_rows
    b = cfg.lsh_bands
    if n == 0:
        return pa.table(
            {
                "band_key": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
                "minhash": pa.array([], pa.binary()),
            }
        )
    sig32 = minhash_matrix(batch, cfg.num_perm)
    bk = band_keys(sig32.astype(np.uint64), b, cfg.lsh_rows).view(np.int64)  # (n, b)
    node = batch["node"].to_numpy()
    rep = np.repeat(sig32, b, axis=0)  # row-major: row i's b bands contiguous
    return pa.table(
        {
            "band_key": pa.array(bk.ravel()),
            "node": pa.array(np.repeat(node, b)),
            "minhash": pack_sigs(rep),
        }
    )


def pair_band_group(group: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Candidate pairs within one band bucket, verified by estimated Jaccard
    (fraction of matching MinHash components ≥ ``jaccard_threshold``).

    Exact-duplicate rows (same node = same sha256) are coalesced first —
    near-dup search runs at content-group granularity exactly like the
    reference's one-``ImagesGroup``-per-distinct-hash model
    (``Core/Entities/Images/ImagesGroup.cs:8-27``).
    """
    nodes = group["node"].to_numpy()
    uniq, first_idx = np.unique(nodes, return_index=True)
    n = uniq.shape[0]
    if n < 2:
        return PAIRS_SCHEMA.empty_table()
    sig = minhash_matrix(group, cfg.num_perm)[first_idx]  # sorted by node asc

    if n <= cfg.max_band_size:
        iu, ju = np.triu_indices(n, k=1)
    else:
        # Hot band: sorted window pairing (salting/splitting with
        # connectivity-preserving links). Every member links to its next
        # `w` neighbors in node order — a connected overlay if any pairs
        # verify transitively; logged upstream via band size counters.
        w = cfg.pair_window
        iu = np.repeat(np.arange(n), w)
        ju = iu + np.tile(np.arange(1, w + 1), n)
        ok = ju < n
        iu, ju = iu[ok], ju[ok]

    est = (sig[iu] == sig[ju]).mean(axis=1)
    pass_mask = est >= (cfg.jaccard_threshold - cfg.verify_margin)
    iu, ju, est = iu[pass_mask], ju[pass_mask], est[pass_mask]
    if iu.shape[0] > cfg.max_pairs_per_band:
        top = np.argpartition(-est, cfg.max_pairs_per_band)[: cfg.max_pairs_per_band]
        iu, ju, est = iu[top], ju[top], est[top]
    if iu.shape[0] == 0:
        return PAIRS_SCHEMA.empty_table()
    a = uniq[iu]
    b = uniq[ju]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return pa.table(
        {
            "a": pa.array(lo),
            "b": pa.array(hi),
            "est": pa.array(est.astype(np.float64)),
            "source": pa.array(["lsh"] * len(lo), pa.string()),
        }
    )


def explode_band_keys(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Lightweight explode: band keys ONLY (no signature payload) — feeds
    collision detection without paying the ×16 signature replication."""
    if batch.num_rows == 0:
        return pa.table({"band_key": pa.array([], pa.int64())})
    sig32 = minhash_matrix(batch, cfg.num_perm)
    bk = band_keys(sig32.astype(np.uint64), cfg.lsh_bands, cfg.lsh_rows).view(np.int64)
    return pa.table({"band_key": pa.array(bk.ravel())})


def duplicated_keys(
    keys_ds, key_col: str, *, driver_max_keys: int = 100_000_000
) -> np.ndarray | None:
    """Sorted array of key values appearing more than once, or None when the
    key stream exceeds ``driver_max_keys`` (caller falls back to the
    distributed count-aggregate).

    A key stream of ≤100M int64 is ≤800MB — trivially sortable on the driver
    and ~10× faster than a distributed aggregate whose fixed per-shuffle cost
    dominates at this size. At 10^12-file scale the stream is too big: the
    Ray aggregate path takes over (same semantics, tested equivalent).
    """
    parts: list[np.ndarray] = []
    total = 0
    for b in keys_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        arr = b[key_col].to_numpy()
        total += arr.shape[0]
        if total > driver_max_keys:
            return None
        parts.append(arr)
    if not parts:
        return np.empty(0, np.int64)
    flat = np.sort(np.concatenate(parts))
    dup_mask = np.zeros(flat.shape[0], dtype=bool)
    dup_mask[1:] = flat[1:] == flat[:-1]
    return np.unique(flat[dup_mask])


def explode_band_key_nodes(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """(band_key, node) explode — 16 bytes/row/band instead of carrying the
    512-byte signature through the shuffle (candidate generation only needs
    bucket membership; verification re-reads signatures for candidates)."""
    if batch.num_rows == 0:
        return pa.table(
            {"band_key": pa.array([], pa.int64()), "node": pa.array([], pa.int64())}
        )
    sig32 = minhash_matrix(batch, cfg.num_perm)
    bk = band_keys(sig32.astype(np.uint64), cfg.lsh_bands, cfg.lsh_rows).view(np.int64)
    node = batch["node"].to_numpy()
    return pa.table(
        {
            "band_key": pa.array(bk.ravel()),
            "node": pa.array(np.repeat(node, cfg.lsh_bands)),
        }
    )


def _pair_nodes_group(group: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """UNVERIFIED candidate pairs within one colliding band bucket: all pairs
    up to ``max_band_size`` members, sorted window pairing beyond (hot-band
    salting, connectivity-preserving). Verification happens downstream from
    the candidates' signatures.

    Output is capped at ``max_pairs_per_band`` (K1) like the verified path:
    window pairs are emitted distance-major (ALL adjacent links first, then
    distance-2, ...) so truncation keeps the connectivity-preserving chain
    and drops only redundant long links.
    """
    nodes = np.unique(group["node"].to_numpy())
    n = nodes.shape[0]
    if n < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if n <= cfg.max_band_size:
        iu, ju = np.triu_indices(n, k=1)
    else:
        w = cfg.pair_window
        d = np.repeat(np.arange(1, w + 1), n)
        iu = np.tile(np.arange(n), w)
        ju = iu + d
        ok = ju < n
        iu, ju = iu[ok], ju[ok]
    if iu.shape[0] > cfg.max_pairs_per_band:
        iu, ju = iu[: cfg.max_pairs_per_band], ju[: cfg.max_pairs_per_band]
    return pa.table({"a": pa.array(nodes[iu]), "b": pa.array(nodes[ju])})


def verify_pairs_by_signature(
    cand, sig_ds, cfg: EngineConfig = DEFAULT_CONFIG, *, gather_max_nodes: int = 2_000_000
):
    """Estimated-Jaccard verification of candidate (a, b) pairs from the
    signature table (the score-threshold rule, ``QdrantRepository.cs:192``).

    Candidate nodes are the duplicate-ish subset (≪ corpus): their packed
    signatures are gathered once (filter + collect, ≈512B each) and the
    whole pair list verified in one vectorized comparison. Above
    ``gather_max_nodes`` callers should use the inline-signature explode
    (``explode_bands`` + ``pair_band_group``) instead.
    """
    import pandas as pd

    if isinstance(cand, pd.DataFrame):
        cand_df = cand
    else:
        cand_df = cand.to_pandas()
    if len(cand_df) == 0:
        return PAIRS_SCHEMA.empty_table()
    a = cand_df["a"].to_numpy()
    b = cand_df["b"].to_numpy()
    nodes_needed = np.unique(np.concatenate([a, b]))
    if nodes_needed.shape[0] > gather_max_nodes:
        raise ValueError("candidate set too large for gather-verify; use inline path")

    sub = filter_by_key_array(
        sig_ds.select_columns(["node", "minhash"]), nodes_needed, "node"
    )
    node_list: list[np.ndarray] = []
    sig_list: list[np.ndarray] = []
    for batch in sub.iter_batches(batch_format="pyarrow", batch_size=65536):
        node_list.append(batch["node"].to_numpy())
        sig_list.append(minhash_matrix(batch, cfg.num_perm))
    nodes_all = np.concatenate(node_list)
    sigs_all = np.concatenate(sig_list)
    # one signature per node (exact-dup rows share identical signatures)
    uniq, first = np.unique(nodes_all, return_index=True)
    sig_mat = sigs_all[first]
    ia = np.searchsorted(uniq, a)
    ib = np.searchsorted(uniq, b)
    ok = (ia < uniq.shape[0]) & (ib < uniq.shape[0])
    ok &= (uniq[np.clip(ia, 0, uniq.shape[0] - 1)] == a) & (
        uniq[np.clip(ib, 0, uniq.shape[0] - 1)] == b
    )
    est = np.zeros(len(a))
    if ok.any():
        est[ok] = (sig_mat[ia[ok]] == sig_mat[ib[ok]]).mean(axis=1)
    keep = est >= (cfg.jaccard_threshold - cfg.verify_margin)
    return pa.table(
        {
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "est": pa.array(est[keep], pa.float64()),
            "source": pa.array(["lsh"] * int(keep.sum()), pa.string()),
        }
    )


def candidate_pairs(
    sig_ds,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int | None = None,
    driver_max_cand_rows: int = 20_000_000,
):
    """signatures Dataset → verified, deduplicated candidate pairs.

    Steps: (band_key, node) explode (16 B/row/band — signatures stay OUT of
    the shuffle) → colliding-key detection (driver sort for ≤100M keys,
    distributed count-aggregate above) → per-band candidate pairing
    (``map_groups``, unverified) → dedup → signature-gather verification
    (estimated Jaccard ≥ τ). When the candidate-node set exceeds the gather
    budget — or the raw candidate-pair stream exceeds
    ``driver_max_cand_rows`` (≈320 MB of int64 pairs; a pathological
    band-collision corpus) — falls back to the inline-signature explode
    (``explode_bands`` → ``pair_band_group``) where pairing AND verification
    happen inside the band groups with no driver state.
    """
    import pandas as pd
    import ray
    import ray.data

    if num_partitions is None:
        num_partitions = default_num_partitions()

    kn = sig_ds.map_batches(
        explode_band_key_nodes, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )
    dup_keys = duplicated_keys(kn.select_columns(["band_key"]), "band_key")

    if dup_keys is None:
        # key stream beyond driver budget → fully distributed inline path
        return _candidate_pairs_inline(sig_ds, kn, cfg, num_partitions)
    if dup_keys.shape[0] == 0:
        return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())

    hot = filter_by_key_array(kn, dup_keys, "band_key")
    cand = hot.groupby("band_key").map_groups(
        _pair_nodes_group, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )
    # dedup BEFORE verification (same pair from many bands): lexsort +
    # adjacent-diff, no per-row Python; gather is ROW-GUARDED — beyond the
    # budget the inline distributed path takes over
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    total_rows = 0
    for batch in cand.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total_rows += batch.num_rows
        if total_rows > driver_max_cand_rows:
            return _candidate_pairs_inline(sig_ds, kn, cfg, num_partitions)
        a_parts.append(batch["a"].to_numpy())
        b_parts.append(batch["b"].to_numpy())
    if not a_parts:
        return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
    ca = np.concatenate(a_parts)
    cb = np.concatenate(b_parts)
    order = np.lexsort((cb, ca))
    ca, cb = ca[order], cb[order]
    keep = np.ones(ca.shape[0], dtype=bool)
    keep[1:] = (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])
    cand_df = pd.DataFrame({"a": ca[keep], "b": cb[keep]})
    try:
        verified = verify_pairs_by_signature(cand_df, sig_ds, cfg)
    except ValueError:
        return _candidate_pairs_inline(sig_ds, kn, cfg, num_partitions)
    return ray.data.from_arrow(verified)


def _candidate_pairs_inline(sig_ds, kn, cfg: EngineConfig, num_partitions: int):
    """Fully distributed fallback: signatures carried through the band
    explode, verification inside each band group (no driver state)."""
    import ray.data

    collisions = (
        kn.select_columns(["band_key"])
        .groupby("band_key")
        .count()
        .rename_columns({"count()": "band_n"})
        .filter(expr="band_n > 1")
        .materialize()  # colliding-band keys only; Ray 2.49 join quirk
    )
    if collisions.count() == 0:
        return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
    bands = sig_ds.map_batches(
        explode_bands, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )
    hot = semi_join_keys(bands, collisions, "band_key", num_partitions=num_partitions)
    pairs = hot.groupby("band_key").map_groups(
        pair_band_group, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )
    return dedupe_pairs(pairs, source="lsh")


def filter_by_key_array(ds, keys: np.ndarray, key_col: str):
    """Vectorized broadcast semi-join against a SORTED key array."""
    import ray

    keys_ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        vals = batch[key_col].to_numpy()
        if ks.shape[0] == 0:
            return batch.slice(0, 0)
        idx = np.searchsorted(ks, vals)
        idx[idx >= ks.shape[0]] = 0
        mask = ks[idx] == vals
        return batch.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow")


def semi_join_keys(
    ds, keys_ds, key_col: str, *, num_partitions: int, broadcast_max: int = 5_000_000
):
    """Keep ``ds`` rows whose ``key_col`` appears in ``keys_ds`` (semi-join).

    The key set is collision-only (≪ exploded rows); below ``broadcast_max``
    keys it is broadcast once via ``ray.put`` and applied as a vectorized
    ``np.isin`` filter — no shuffle, no join-aggregator actor startup.
    Above the threshold it falls back to the distributed hash join.
    """
    import ray

    n_keys = keys_ds.count()
    if n_keys <= broadcast_max:
        key_arrays = [
            b[key_col].to_numpy()
            for b in keys_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        ]
        keys = np.sort(np.concatenate(key_arrays)) if key_arrays else np.empty(0, np.int64)
        keys_ref = ray.put(keys)

        def filt(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            vals = batch[key_col].to_numpy()
            idx = np.searchsorted(ks, vals)
            idx[idx >= ks.shape[0]] = 0
            mask = ks[idx] == vals if ks.shape[0] else np.zeros(len(vals), bool)
            return batch.filter(pa.array(mask))

        return ds.map_batches(filt, batch_format="pyarrow")
    return ds.join(
        keys_ds, join_type="inner", num_partitions=num_partitions, on=(key_col,)
    )


def dedupe_pairs(pairs_ds, *, source: str | None, driver_max_rows: int = 2_000_000):
    """Canonical (a, b) pair dedup, size-dispatched.

    Verified pair sets are ≪ corpus; below ``driver_max_rows`` a pandas
    groupby on the collected table is orders of magnitude faster than a Ray
    aggregate (whose fixed per-shuffle cost — aggregator actor startup —
    dominated profiling at ~30s regardless of row count). Above the
    threshold, a Ray aggregate on the REAL composite key ``(a, b)`` keeps it
    distributed and exact — a single mixed-key groupby would let a hash
    collision between two distinct pairs fabricate a chimera pair
    (max a of one, max b of the other) and drop both real pairs.
    """
    import pandas as pd
    import ray.data

    pairs_ds = pairs_ds.materialize()
    n = pairs_ds.count()
    if n == 0:
        return pairs_ds
    if n <= driver_max_rows:
        dfs = [
            b.to_pandas()
            for b in pairs_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        ]
        df = pd.concat(dfs, ignore_index=True)
        if source is None and "source" in df.columns:
            ded = df.sort_values("est", ascending=False).groupby(
                ["a", "b"], as_index=False
            ).agg(est=("est", "max"), source=("source", "first"))
        else:
            ded = df.groupby(["a", "b"], as_index=False).agg(est=("est", "max"))
            ded["source"] = source or "merged"
        return ray.data.from_arrow(pa.Table.from_pandas(ded, preserve_index=False))

    ded = (
        pairs_ds.select_columns(["a", "b", "est"])
        .groupby(["a", "b"])
        .max("est")
        .rename_columns({"max(est)": "est"})
    )

    def add_source(batch: pa.Table) -> pa.Table:
        return batch.append_column("source", pa.array([source] * batch.num_rows, pa.string()))

    return ded.map_batches(add_source, batch_format="pyarrow")
