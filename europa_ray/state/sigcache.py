"""Incremental cross-run signature + pair cache (J1/J2/SO2).

The reference's defining durable behavior: its Qdrant collection doubles as
a cross-run cache — a cached signature skips recompute per group
(``/root/reference/Api/Implementations/SimilarImages/SimilarImageFinder.cs:
167-178``, ``Api/Client/QdrantRepository.cs:82-103``) and cached neighbor
edges skip the ANN re-query (``QdrantRepository.cs:158-182``), with new
pairs anti-joined against persisted ones (``MatchExcept``,
``QdrantRepository.cs:193-194`` — SO2 query-side exclusion).

Engine equivalents, as plain partitioned Parquet under a cache root:

- ``signatures/``: one row per distinct content node
  (node, sha256, n_tokens, minhash, simhash). On re-run, every row is
  hashed (sha256 is the node identity — unavoidable and cheap) but
  tokenize/shingle/MinHash/SimHash run ONLY for nodes not in the cache;
  cached nodes get their payload re-attached via broadcast lookup
  (join fallback above a size threshold). A grown corpus therefore
  computes only the delta.
- ``pairs/``: verified (a, b, est, source) edges. New candidate pairs are
  anti-joined against the persisted set (SO2) — only genuinely new edges
  are verified output; the union of cached + fresh edges feeds CC.

Cache keying: the cache root is suffixed with the config fingerprint —
signatures under different shingle/permutation configs never mix.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from europa_ray.config import DEFAULT_CONFIG, EngineConfig

SIG_PAYLOAD_COLS = ("node", "sha256", "n_tokens", "minhash", "simhash")


def _cache_files(d: str) -> list[str]:
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def _filter_flag(ds, want: bool, col: str = "from_cache"):
    """Vectorized boolean-column filter (no expr-parser dependence)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        mask = batch[col] if want else pc.invert(batch[col])
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def _sig_cfg_fingerprint(cfg: EngineConfig) -> str:
    """Signature-relevant config only: filters/thresholds don't change what
    a node's signature IS."""
    from europa_ray.state.manifest import fingerprint_of

    return fingerprint_of(
        "sig-v1",
        cfg.seed,
        cfg.num_perm,
        cfg.shingle_k,
        cfg.max_sig_tokens,
        cfg.simhash_bits,
        cfg.minhash_mode,
        cfg.fuzzy_algo,
    )


def cached_nodes(sig_cache_dir: str) -> np.ndarray:
    """Sorted int64 node ids present in the signature cache."""
    files = _cache_files(sig_cache_dir)
    if not files:
        return np.empty(0, dtype=np.int64)
    parts = [pq.read_table(f, columns=["node"])["node"].to_numpy() for f in files]
    return np.unique(np.concatenate(parts))


def incremental_signatures(
    files,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    cache_root: str,
    broadcast_max_nodes: int = 5_000_000,
):
    """Signature table with cross-run reuse.

    Returns ``(sigs_dataset, counters)`` where counters records
    ``sig_nodes_cached`` (reused) and ``sig_nodes_computed`` (the delta) —
    the test hook for "only the delta was re-signatured".
    """
    import ray
    import ray.data

    from europa_ray.stages.signatures import signature_task, signatures

    sig_dir = os.path.join(cache_root, "signatures-" + _sig_cfg_fingerprint(cfg))
    os.makedirs(sig_dir, exist_ok=True)
    known = cached_nodes(sig_dir)
    known_ref = ray.put(known)

    from europa_ray.stages.filters import apply_filters
    from europa_ray.stages.hash_stage import add_sha256
    from europa_ray.util import hex_to_u64

    ds = apply_filters(files, cfg)

    def split_and_sign(batch: pa.Table) -> pa.Table:
        """Hash every row; run the full signature kernel only for rows whose
        node is NOT cached. Cached rows carry null payloads (re-attached
        from the cache afterwards)."""
        kn = ray.get(known_ref)
        hashed = add_sha256(batch, drop_content=False, keep_cols=(*id_cols, "content"))
        if hashed.num_rows == 0:
            out = hashed.select([c for c in hashed.column_names if c != "content"])
            out = out.append_column("n_tokens", pa.array([], pa.int64()))
            out = out.append_column("minhash", pa.array([], pa.binary()))
            out = out.append_column("simhash", pa.array([], pa.int64()))
            return out.append_column("node", pa.array([], pa.int64()))
        node = hex_to_u64(hashed["sha256"].to_pylist()).view(np.int64)
        if kn.shape[0]:
            idx = np.searchsorted(kn, node)
            idx[idx >= kn.shape[0]] = 0
            cached = kn[idx] == node
        else:
            cached = np.zeros(node.shape[0], dtype=bool)

        new_part = hashed.filter(pa.array(~cached))
        old_part = hashed.filter(pa.array(cached))
        tables = []
        if new_part.num_rows:
            sigs_new = signature_task(new_part, cfg, id_cols=id_cols)
            tables.append(sigs_new.append_column(
                "from_cache", pa.array(np.zeros(sigs_new.num_rows, dtype=bool))
            ))
        if old_part.num_rows:
            t = old_part.select(
                [c for c in (*id_cols, "sha256") if c in old_part.column_names]
            )
            t = t.append_column("node", pa.array(node[cached]))
            t = t.append_column(
                "n_tokens", pa.array([None] * t.num_rows, pa.int64())
            )
            t = t.append_column("minhash", pa.array([None] * t.num_rows, pa.binary()))
            t = t.append_column("simhash", pa.array([None] * t.num_rows, pa.int64()))
            t = t.append_column("from_cache", pa.array(np.ones(t.num_rows, dtype=bool)))
            # column order parity with the signature stage output
            tables.append(t.select(tables[0].column_names if tables else [
                *[c for c in id_cols if c in t.column_names], "sha256", "node",
                "n_tokens", "minhash", "simhash", "from_cache",
            ]))
        if not tables:
            return signature_task(hashed.slice(0, 0), cfg, id_cols=id_cols).append_column(
                "from_cache", pa.array([], pa.bool_())
            )
        return pa.concat_tables(tables, promote_options="default")

    allrows = ds.map_batches(split_and_sign, batch_size=cfg.batch_size,
                             batch_format="pyarrow").materialize()

    # persist the delta: one cache row per distinct NEW node
    new_rows = _filter_flag(allrows, False)
    new_nodes_written = _append_distinct_sigs(new_rows, sig_dir, known)

    n_total = allrows.count()
    n_cached_rows = _filter_flag(allrows, True).count()

    # re-attach cached payloads
    if known.shape[0] == 0:
        sigs = allrows.drop_columns(["from_cache"])
    else:
        sigs = _attach_cached_payloads(
            allrows, sig_dir, broadcast_max_nodes=broadcast_max_nodes
        )
    counters = {
        "rows_in": float(n_total),
        "rows_from_cache": float(n_cached_rows),
        "sig_nodes_computed": float(new_nodes_written),
        "sig_nodes_cached": float(known.shape[0]),
    }
    return sigs, counters


def _append_distinct_sigs(new_rows, sig_dir: str, known: np.ndarray) -> int:
    """Write one cache row per distinct new node; returns how many."""
    import uuid

    seen: set[int] = set()
    out_tables = []
    for b in new_rows.iter_batches(batch_format="pyarrow", batch_size=65536):
        nodes = b["node"].to_numpy()
        uniq, first = np.unique(nodes, return_index=True)
        fresh_idx = [int(i) for u, i in zip(uniq, first) if int(u) not in seen]
        seen.update(int(u) for u in uniq)
        if fresh_idx:
            out_tables.append(
                b.select([c for c in SIG_PAYLOAD_COLS]).take(pa.array(fresh_idx))
            )
    if not out_tables:
        return 0
    tbl = pa.concat_tables(out_tables)
    pq.write_table(tbl, os.path.join(sig_dir, f"part-{uuid.uuid4().hex}.parquet"))
    return tbl.num_rows


def _attach_cached_payloads(allrows, sig_dir: str, *, broadcast_max_nodes: int):
    """Fill null payloads of cached rows from the cache parquet.

    Broadcast path (cache ≤ ``broadcast_max_nodes``): sorted node array +
    packed payload arrays via ``ray.put``, searchsorted per batch. Above the
    threshold: Dataset hash join on node (payloads are plain binary —
    Acero-safe)."""
    import ray
    import ray.data

    files = _cache_files(sig_dir)
    cache_tbl = pa.concat_tables([pq.read_table(f) for f in files])
    if cache_tbl.num_rows <= broadcast_max_nodes:
        nodes = cache_tbl["node"].to_numpy()
        order = np.argsort(nodes)
        nodes = nodes[order]
        n_tok = cache_tbl["n_tokens"].to_numpy()[order]
        sim = cache_tbl["simhash"].to_numpy()[order]
        mh = cache_tbl["minhash"].combine_chunks().take(pa.array(order))
        payload_ref = ray.put((nodes, n_tok, sim, mh))

        def fill(batch: pa.Table) -> pa.Table:
            kn, ktok, ksim, kmh = ray.get(payload_ref)
            from_cache = batch["from_cache"].to_numpy(zero_copy_only=False)
            out = batch.drop_columns(["from_cache"])
            if not from_cache.any():
                return out
            node = batch["node"].to_numpy()
            idx = np.searchsorted(kn, node)
            idx[idx >= kn.shape[0]] = 0
            hit = (kn[idx] == node) & from_cache
            # cached rows MUST hit (their node came from the cache).
            # fill_null BEFORE to_numpy: a null-bearing int64 column converts
            # to float64 (NaN for null), silently corrupting 64-bit values
            import pyarrow.compute as pc

            n_tokens = pc.fill_null(batch["n_tokens"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
            simhash = pc.fill_null(batch["simhash"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
            n_tokens = np.where(hit, ktok[idx], n_tokens)
            simhash = np.where(hit, ksim[idx], simhash)
            mh_col = batch["minhash"].combine_chunks()
            take_idx = np.where(hit, idx, 0)
            filled_mh = kmh.take(pa.array(take_idx))
            import pyarrow.compute as pc

            try:
                mh_out = pc.if_else(pa.array(hit), filled_mh, mh_col)
            except pa.ArrowNotImplementedError:  # binary if_else fallback
                mh_out = pa.array(
                    [
                        filled_mh[i].as_py() if h else mh_col[i].as_py()
                        for i, h in enumerate(hit)
                    ],
                    type=pa.binary(),
                )
            out = out.set_column(out.column_names.index("n_tokens"), "n_tokens", pa.array(n_tokens))
            out = out.set_column(out.column_names.index("simhash"), "simhash", pa.array(simhash))
            out = out.set_column(out.column_names.index("minhash"), "minhash", mh_out)
            return out

        return allrows.map_batches(fill, batch_format="pyarrow")

    # big-cache path: hash join on node
    cached_side = ray.data.from_arrow(cache_tbl.select(["node", "n_tokens", "minhash", "simhash"])).materialize()
    from europa_ray.util import default_num_partitions

    old = allrows.filter(expr="from_cache == true").drop_columns(
        ["from_cache", "n_tokens", "minhash", "simhash"]
    )
    new = allrows.filter(expr="from_cache == false").drop_columns(["from_cache"])
    joined = old.join(
        cached_side, join_type="inner", num_partitions=default_num_partitions(), on=("node",)
    )
    return new.union(joined)


# ---------------------------------------------------------------------------
# pair cache (J2 / SO2)
# ---------------------------------------------------------------------------

def cached_pairs_table(pairs_dir: str) -> pa.Table | None:
    files = _cache_files(pairs_dir)
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def incremental_pairs(
    pairs_ds,
    *,
    cache_root: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
):
    """Union freshly discovered pairs with the persisted edge set.

    Anti-joins new pairs against the cache (SO2 ``MatchExcept``: only
    genuinely new edges are "new"), appends the delta, and returns
    ``(all_pairs_dataset, counters)`` with ``pairs_from_cache`` /
    ``pairs_new`` counters. In this architecture verification is a cheap
    vectorized comparison, so unlike the reference the saving is the
    anti-join bookkeeping rather than skipped ANN queries — semantics
    match ``QdrantRepository.cs:158-182,193-194``."""
    import uuid

    import ray.data

    pairs_dir = os.path.join(cache_root, "pairs-" + _sig_cfg_fingerprint(cfg))
    os.makedirs(pairs_dir, exist_ok=True)
    cached = cached_pairs_table(pairs_dir)

    pairs_ds = pairs_ds.materialize()
    fresh_tbl = pa.concat_tables(
        list(pairs_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)),
        promote_options="default",
    ) if pairs_ds.count() else None

    n_cached = cached.num_rows if cached is not None else 0
    if fresh_tbl is not None and cached is not None and cached.num_rows:
        # exact composite-key anti-join (a hash of (a,b) could collide and
        # silently swallow a genuinely-new pair — same chimera risk the
        # dedupe_pairs distributed path avoids by grouping on the REAL key)
        import pandas as pd

        fresh_ab = pd.DataFrame(
            {"a": fresh_tbl["a"].to_numpy(), "b": fresh_tbl["b"].to_numpy()}
        )
        cached_ab = pd.DataFrame(
            {"a": cached["a"].to_numpy(), "b": cached["b"].to_numpy()}
        ).drop_duplicates()
        merged = fresh_ab.merge(cached_ab, on=["a", "b"], how="left", indicator=True)
        known_mask = (merged["_merge"] == "both").to_numpy()
        fresh_tbl = fresh_tbl.filter(pa.array(~known_mask))
    n_new = fresh_tbl.num_rows if fresh_tbl is not None else 0
    if fresh_tbl is not None and fresh_tbl.num_rows:
        pq.write_table(fresh_tbl, os.path.join(pairs_dir, f"part-{uuid.uuid4().hex}.parquet"))

    merged = cached_pairs_table(pairs_dir)
    counters = {"pairs_from_cache": float(n_cached), "pairs_new": float(n_new)}
    if merged is None:
        from europa_ray.stages.lsh import PAIRS_SCHEMA

        return ray.data.from_arrow(PAIRS_SCHEMA.empty_table()), counters
    return ray.data.from_arrow(merged), counters
