"""Distributed candidate-pair verification (cogroup-by-pair).

The content-level verify operators (exact n-gram Jaccard, longest shared
substring) need, for each candidate pair (a, b), both nodes' full payload
(shingle set / ordered w-gram array) side by side. Gathering all payloads
into a driver dict is bounded by driver memory — fine for small candidate
sets, fatal at scale. This module provides one machinery with two
equivalence-tested deployment shapes, dispatched on measured payload volume:

1. **Shared explode stage** (both shapes): the candidate pair list — pairs
   are duplicate-candidates only, ≪ corpus — is broadcast once via
   ``ray.put`` as sorted node → (pair_idx, side) membership arrays. One
   streaming pass over the corpus computes payloads ONLY for candidate
   nodes (vectorized membership via ``searchsorted``) and emits one
   ``(pair_idx, side, payload)`` row per pair membership. Payloads are
   packed as binary blobs (``large_binary``) so they survive any shuffle.
2. **Driver shape** (payload volume ≤ budget): the payload rows are
   gathered and each pair verified locally — no shuffle, no aggregator
   startup. The gather is guarded byte-by-byte: crossing the budget aborts
   it and falls through to shape 3.
3. **Distributed shape**: ``groupby(pair_idx >> PAIR_BUCKET_SHIFT)``
   cogroups ~64 pairs per bucket and verifies each bucket with one sorted
   segment sweep — the shuffle moves candidate payloads only, no process
   ever holds more than one bucket, and Python group-call overhead is paid
   once per 64 pairs instead of once per pair.

Scale note: payload volume is amplified by pair-degree (a node in d pairs
ships its payload d times). Candidate generation bounds degree upstream
(window-linking + per-band pair caps for hot buckets), which bounds the
amplification.

Reference parity: this is the "verify candidates from their full
representations" step of Europa's similarity passes (``/root/reference/Api/
Implementations/SimilarImages/SimilarImageFinder.cs:186-200`` — candidates
from the ANN index, re-checked against the stored full signature).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

from europa_ray.util import hex_to_u64, sha256_hex_arrow

PAIR_BUCKET_SHIFT = 6  # 64 pairs per distributed verify group

PAYLOAD_SCHEMA = pa.schema(
    [
        pa.field("pair_idx", pa.int64()),
        pa.field("side", pa.int64()),
        pa.field("payload", pa.large_binary()),
    ]
)


def membership_arrays(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pairs → (nodes_sorted, pair_idx, side) parallel arrays for vectorized
    node→memberships lookup (searchsorted range per node)."""
    n = a.shape[0]
    nodes = np.concatenate([a, b]).astype(np.int64)
    pidx = np.tile(np.arange(n, dtype=np.int64), 2)
    side = np.repeat(np.array([0, 1], dtype=np.int64), n)
    order = np.argsort(nodes, kind="stable")
    return nodes[order], pidx[order], side[order]


def pack_payloads(values: np.ndarray, loffsets: np.ndarray) -> pa.Array:
    """Flat uint64 payload values + row offsets → large_binary column
    (zero per-row Python, like ``signatures.pack_sigs``)."""
    data = np.ascontiguousarray(values.view(np.uint64)).tobytes()
    boff = (loffsets.astype(np.int64) * 8).tobytes()
    return pa.Array.from_buffers(
        pa.large_binary(), loffsets.shape[0] - 1, [None, pa.py_buffer(boff), pa.py_buffer(data)]
    )


def unpack_payload(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint64)


def _ranges_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate ``arange(starts[i], starts[i]+lens[i])`` vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    excl = np.cumsum(lens) - lens
    return np.repeat(starts, lens) + (np.arange(total, dtype=np.int64) - np.repeat(excl, lens))


def payload_rows(
    files,
    a: np.ndarray,
    b: np.ndarray,
    payload_fn: Callable[[pa.Array], tuple[np.ndarray, np.ndarray]],
    *,
    content_col: str = "content",
    node_col: str | None = None,
):
    """Corpus Dataset → (pair_idx, side, payload) rows for candidate nodes.

    ``payload_fn(content_column) -> (flat uint64 values, row offsets)``
    computes the per-row payload for a *filtered* content column.

    Node identity: ``sha256(content)``-derived by default (content dedup);
    ``node_col`` switches to an explicit int64 id column (e.g. ``vec_id``
    for embedding payloads, where identity is positional not content-based).
    """
    import ray

    members_ref = ray.put(membership_arrays(a, b))

    def explode(batch: pa.Table) -> pa.Table:
        nodes_s, pidx, side = ray.get(members_ref)
        content = batch[content_col]
        if node_col is not None:
            idx = list(range(batch.num_rows))
            nds = batch[node_col].to_numpy().astype(np.int64)
        else:
            sha = sha256_hex_arrow(content)
            idx = [i for i, h in enumerate(sha) if h is not None]
            if not idx:
                return PAYLOAD_SCHEMA.empty_table()
            nds = hex_to_u64([sha[i] for i in idx]).view(np.int64)
        if not idx:
            return PAYLOAD_SCHEMA.empty_table()
        # candidate membership + in-batch dedup by node (exact-dup rows in
        # one batch share content → one payload suffices; cross-batch dups
        # are deduped at verify time by taking the first payload per side)
        uniq_nds, first = np.unique(nds, return_index=True)
        pl = np.searchsorted(nodes_s, uniq_nds, side="left")
        pr = np.searchsorted(nodes_s, uniq_nds, side="right")
        occ_t = pr - pl
        wanted = occ_t > 0
        if not wanted.any():
            return PAYLOAD_SCHEMA.empty_table()
        uniq_nds, first, pl, occ_t = uniq_nds[wanted], first[wanted], pl[wanted], occ_t[wanted]
        kept_idx = np.asarray(idx, dtype=np.int64)[first]

        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        sub = content.take(pa.array(kept_idx))
        flat, off = payload_fn(sub)

        mem_idx = _ranges_gather(pl, occ_t)
        occ_src = np.repeat(np.arange(kept_idx.shape[0], dtype=np.int64), occ_t)
        plens = np.diff(off)
        occ_len = plens[occ_src]
        values = flat[_ranges_gather(off[:-1][occ_src], occ_len)]
        loff = np.zeros(occ_src.shape[0] + 1, dtype=np.int64)
        np.cumsum(occ_len, out=loff[1:])
        return pa.table(
            {
                "pair_idx": pa.array(pidx[mem_idx]),
                "side": pa.array(side[mem_idx]),
                "payload": pack_payloads(values, loff),
            }
        )

    return files.map_batches(explode, batch_format="pyarrow")


def node_payload_rows(
    files,
    nodes_sorted: np.ndarray,
    payload_fn: Callable[[pa.Array], tuple[np.ndarray, np.ndarray]],
    *,
    content_col: str = "content",
    node_col: str | None = None,
):
    """Corpus Dataset → DISTINCT (node, payload) rows for candidate nodes.

    The driver verify shape only needs each node's payload ONCE — shipping
    it per pair membership amplifies payload volume by pair-degree (a node
    in a k-clique ships its payload k−1 times; a 3 000-doc boilerplate
    clique turns ~150 MB of distinct payloads into ~20 GB of memberships).
    In-batch duplicates (exact-dup contents) are deduped here; cross-batch
    duplicates are deduped keep-first at gather time."""
    import ray

    nodes_ref = ray.put(np.asarray(nodes_sorted, dtype=np.int64))
    out_schema = pa.schema(
        [pa.field("node", pa.int64()), pa.field("payload", pa.large_binary())]
    )

    def explode(batch: pa.Table) -> pa.Table:
        nodes_s = ray.get(nodes_ref)
        content = batch[content_col]
        if node_col is not None:
            idx = list(range(batch.num_rows))
            nds = batch[node_col].to_numpy().astype(np.int64)
        else:
            sha = sha256_hex_arrow(content)
            idx = [i for i, h in enumerate(sha) if h is not None]
            if not idx:
                return out_schema.empty_table()
            nds = hex_to_u64([sha[i] for i in idx]).view(np.int64)
        if not idx:
            return out_schema.empty_table()
        uniq_nds, first = np.unique(nds, return_index=True)
        pos = np.searchsorted(nodes_s, uniq_nds)
        pos[pos >= nodes_s.shape[0]] = 0
        wanted = (
            nodes_s[pos] == uniq_nds if nodes_s.shape[0] else np.zeros(uniq_nds.shape[0], bool)
        )
        if not wanted.any():
            return out_schema.empty_table()
        uniq_nds, first = uniq_nds[wanted], first[wanted]
        kept_idx = np.asarray(idx, dtype=np.int64)[first]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        sub = content.take(pa.array(kept_idx))
        flat, off = payload_fn(sub)
        return pa.table(
            {
                "node": pa.array(uniq_nds),
                "payload": pack_payloads(flat, off.astype(np.int64)),
            }
        )

    return files.map_batches(explode, batch_format="pyarrow")


def _verify_pair_range(
    payload_map: tuple[np.ndarray, np.ndarray, np.ndarray],
    a: np.ndarray,
    b: np.ndarray,
    pair_metric,
    emit,
    out_schema: pa.Schema,
) -> pa.Table:
    """Verify pairs (a[i], b[i]) against a (sorted node keys, flat payload
    values, offsets) map; pairs with a missing side are skipped."""
    keys, flat, offs = payload_map
    ia = np.searchsorted(keys, a)
    ib = np.searchsorted(keys, b)
    ia[ia >= keys.shape[0]] = 0
    ib[ib >= keys.shape[0]] = 0
    ok = (keys[ia] == a) & (keys[ib] == b) if keys.shape[0] else np.zeros(a.shape[0], bool)
    out_rows = []
    for i in np.nonzero(ok)[0]:
        pa_buf = flat[offs[ia[i]] : offs[ia[i] + 1]]
        pb_buf = flat[offs[ib[i]] : offs[ib[i] + 1]]
        m = pair_metric(pa_buf, pb_buf)
        if m is not None:
            out_rows.append(emit(int(a[i]), int(b[i]), m))
    if not out_rows:
        return out_schema.empty_table()
    cols = list(zip(*out_rows))
    return pa.table(
        {f.name: pa.array(list(c), f.type) for f, c in zip(out_schema, cols)}
    )


def gather_ab_chunks(cand_ds, chunk_rows: int):
    """Stream a candidate-pair Dataset's (a, b) columns to the driver in
    chunks of ≤ ``chunk_rows`` — the explicit budget for the pair-list
    broadcast (each chunk's membership arrays are ≤ chunk_rows × 24 B).
    Yields (a, b) int64 array pairs."""
    buf_a: list[np.ndarray] = []
    buf_b: list[np.ndarray] = []
    n = 0
    for bt in cand_ds.iter_batches(
        batch_format="pyarrow", batch_size=min(max(chunk_rows, 1), 1 << 20)
    ):
        av = bt["a"].to_numpy()
        bv = bt["b"].to_numpy()
        pos = 0
        while pos < av.shape[0]:
            take = min(av.shape[0] - pos, chunk_rows - n)
            buf_a.append(av[pos : pos + take])
            buf_b.append(bv[pos : pos + take])
            n += take
            pos += take
            if n >= chunk_rows:
                yield np.concatenate(buf_a), np.concatenate(buf_b)
                buf_a, buf_b, n = [], [], 0
    if n:
        yield np.concatenate(buf_a), np.concatenate(buf_b)


def verify_pairs_chunked(
    files,
    cand_ds,
    payload_fn,
    pair_metric,
    out_schema: pa.Schema,
    emit,
    *,
    content_col: str = "content",
    node_col: str | None = None,
    driver_max_payload_bytes: int = 512 << 20,
    chunk_rows: int = 5_000_000,
):
    """:func:`verify_pairs` over a candidate-pair DATASET with an enforced
    driver budget: the (a, b) list is gathered in ≤ ``chunk_rows`` chunks,
    each verified independently (one corpus payload pass per chunk — the
    map stage is the cheap part and multi-chunk runs are the rare
    over-budget case), results unioned. Candidate generators upstream are
    budget-capped, so a single chunk is the norm."""
    import ray.data

    outs = []
    for a, b in gather_ab_chunks(cand_ds, chunk_rows):
        outs.append(
            verify_pairs(
                files,
                a,
                b,
                payload_fn,
                pair_metric,
                out_schema,
                emit,
                content_col=content_col,
                node_col=node_col,
                driver_max_payload_bytes=driver_max_payload_bytes,
            )
        )
    if not outs:
        return ray.data.from_arrow(out_schema.empty_table())
    if len(outs) == 1:
        return outs[0]
    # one variadic union node — a chained a.union(b).union(c)... plan
    # recurses per link and blows the stack at many chunks
    return outs[0].union(*outs[1:])


def verify_pairs(
    files,
    a: np.ndarray,
    b: np.ndarray,
    payload_fn: Callable[[pa.Array], tuple[np.ndarray, np.ndarray]],
    pair_metric: Callable[[np.ndarray, np.ndarray], float | None],
    out_schema: pa.Schema,
    emit: Callable[[int, int, float], tuple],
    *,
    content_col: str = "content",
    node_col: str | None = None,
    driver_max_payload_bytes: int = 512 << 20,
):
    """Verify candidate pairs (a[i], b[i]) against full per-node payloads.

    ``pair_metric(payload_a, payload_b)`` returns the pair's score or None
    (below threshold). ``emit(a, b, metric)`` returns the output row tuple
    matching ``out_schema``. Dispatch: driver verify below
    ``driver_max_payload_bytes`` of gathered payload, cogroup shuffle above
    (equivalence-tested by forcing the threshold to 0).
    """
    import ray
    import ray.data

    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if a.shape[0] == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    # --- driver shape (distinct-node payload map + parallel verify) ---
    # The budget bounds DISTINCT candidate-node payload bytes (each node
    # once), not per-pair memberships — a clique of k docs needs k payloads
    # here but k·(k−1) membership rows in the cogroup shape below.
    if driver_max_payload_bytes > 0:
        nodes_sorted = np.unique(np.concatenate([a, b]))
        nrows_ds = node_payload_rows(
            files, nodes_sorted, payload_fn, content_col=content_col, node_col=node_col
        )
        got: dict[int, np.ndarray] = {}
        total = 0
        over = False
        for batch in nrows_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            pay = batch["payload"]
            if isinstance(pay, pa.ChunkedArray):
                pay = pay.combine_chunks()
            total += pay.nbytes
            if total > driver_max_payload_bytes:
                over = True
                break
            for n_i, buf in zip(batch["node"].to_numpy(), pay.to_pylist()):
                if int(n_i) not in got:  # cross-batch dup contents: keep first
                    got[int(n_i)] = unpack_payload(buf)
        if not over:
            if got:
                keys = np.fromiter(got.keys(), dtype=np.int64, count=len(got))
                keys.sort()
                vals = [got[int(k)] for k in keys]
                lens = np.fromiter(
                    (v.shape[0] for v in vals), dtype=np.int64, count=len(vals)
                )
                offs = np.zeros(len(vals) + 1, dtype=np.int64)
                np.cumsum(lens, out=offs[1:])
                flat = np.concatenate(vals) if vals else np.empty(0, np.uint64)
            else:
                keys = np.empty(0, np.int64)
                flat = np.empty(0, np.uint64)
                offs = np.zeros(1, np.int64)
            n_pairs = a.shape[0]
            if n_pairs <= 50_000:  # small: one local vectorized-lookup sweep
                tbl = _verify_pair_range(
                    (keys, flat, offs), a, b, pair_metric, emit, out_schema
                )
                return ray.data.from_arrow(tbl)
            # large pair lists (boilerplate cliques): broadcast the payload
            # map once via ray.put, verify pair ranges in parallel tasks
            from europa_ray.util import default_num_partitions

            map_ref = ray.put((keys, flat, offs))
            ab_ref = ray.put((a, b))
            n_chunks = int(
                min(max(1, n_pairs // 50_000), max(default_num_partitions(), 1) * 2)
            )
            bounds = np.linspace(0, n_pairs, n_chunks + 1).astype(np.int64)

            @ray.remote
            def _chunk(map_t, ab_t, lo: int, hi: int) -> pa.Table:
                aa, bb = ab_t
                return _verify_pair_range(
                    map_t, aa[lo:hi], bb[lo:hi], pair_metric, emit, out_schema
                )

            tbls = ray.get(
                [
                    _chunk.remote(map_ref, ab_ref, int(bounds[i]), int(bounds[i + 1]))
                    for i in range(n_chunks)
                ]
            )
            tbls = [t for t in tbls if t.num_rows]
            if not tbls:
                return ray.data.from_arrow(out_schema.empty_table())
            return ray.data.from_arrow(pa.concat_tables(tbls))
        # over budget: fall through to the cogroup shuffle (recompute the
        # explode per membership — rare, and the map stage is the cheap part)

    rows_ds = payload_rows(
        files, a, b, payload_fn, content_col=content_col, node_col=node_col
    )

    # --- distributed shape (bucketed cogroup) ---
    # Grouping on raw pair_idx pays one Python map_groups call + one 1-row
    # output table PER PAIR — exactly on the runs that are huge. Bucketing
    # ``pair_idx >> PAIR_BUCKET_SHIFT`` verifies up to 2^shift pairs per
    # group call (one sort + one output table per bucket), cutting group
    # overhead 64× while moving the identical rows through the shuffle.
    import ray

    ab_ref = ray.put((a, b))

    def add_bucket(batch: pa.Table) -> pa.Table:
        pidx = batch["pair_idx"].to_numpy()
        return batch.append_column(
            "pair_bucket", pa.array(pidx >> PAIR_BUCKET_SHIFT)
        )

    def verify_bucket(group: pa.Table) -> pa.Table:
        aa, bb = ray.get(ab_ref)
        pidx = group["pair_idx"].to_numpy()
        sides = group["side"].to_numpy()
        # stable (pair, side) sort: the first side-k row per pair is the
        # earliest original occurrence — same payload choice as the
        # one-group-per-pair shape (equivalence-tested at budget 0)
        order = np.lexsort((sides, pidx))
        ps, ss = pidx[order], sides[order]
        pay = group["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        seg_starts = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
        seg_ends = np.concatenate([seg_starts[1:], [ps.shape[0]]])
        out_rows = []
        for s0, s1 in zip(seg_starts, seg_ends):
            seg_sides = ss[s0:s1]
            i0 = np.nonzero(seg_sides == 0)[0]
            i1 = np.nonzero(seg_sides == 1)[0]
            if i0.shape[0] == 0 or i1.shape[0] == 0:
                continue
            pa_buf = unpack_payload(pay[int(order[s0 + i0[0]])].as_py())
            pb_buf = unpack_payload(pay[int(order[s0 + i1[0]])].as_py())
            m = pair_metric(pa_buf, pb_buf)
            if m is None:
                continue
            p_i = int(ps[s0])
            out_rows.append(emit(int(aa[p_i]), int(bb[p_i]), m))
        if not out_rows:
            return out_schema.empty_table()
        cols = list(zip(*out_rows))
        return pa.table(
            {f.name: pa.array(list(c), f.type) for f, c in zip(out_schema, cols)}
        )

    bucketed = rows_ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("pair_bucket").map_groups(
        verify_bucket, batch_format="pyarrow"
    )
