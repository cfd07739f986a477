"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — per-batch NumPy matmul against a
broadcast (``ray.put``) query matrix, per-batch partial top-k, small driver
merge. Scale path: random-hyperplane LSH buckets so each query only scans
its bucket — the same banding idea the MinHash path uses, here over sign
bits of random projections.

Also: embedding near-duplicate pairs (cosine ≥ τ), the embedding analog of
the content near-dup passes.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_tie_safe(scores: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the ``kk`` largest scores PLUS every row tied with the
    kk-th — so downstream (score DESC, id ASC) merging never loses a
    smaller-id tie to per-batch truncation."""
    n = scores.shape[0]
    if kk >= n:
        return np.arange(n)
    thresh = np.partition(scores, n - kk)[n - kk]
    return np.nonzero(scores >= thresh)[0]


def brute_force_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k of each query against the full dataset.

    Streams batches; each batch contributes its local top-k per query
    (batch_rows × n_queries matmul), merged in a driver-side heap — the
    driver never holds more than n_queries × k × n_batches candidates.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_embedding_matrix(batch))
        ids = batch[id_col].to_numpy()
        sims = m @ q.T  # (n, nq)
        kk = min(k + 1, sims.shape[0])
        nq = q.shape[0]
        out_q, out_n, out_s = [], [], []
        for j in range(nq):
            # tie-safe: keep EVERY row whose score ties the kk-th largest —
            # plain argpartition may keep larger-id ties and drop smaller-id
            # ones that the global (score DESC, id ASC) order ranks inside
            # top-k (oracle mismatch on duplicate embeddings)
            idx = _topk_tie_safe(sims[:, j], kk)
            out_q.extend([j] * idx.shape[0])
            out_n.extend(ids[idx].tolist())
            out_s.extend(sims[idx, j].tolist())
        return pa.table(
            {
                "qidx": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    heaps: dict[int, list] = {j: [] for j in range(qn.shape[0])}
    for batch in embeddings.map_batches(score, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=8192
    ):
        for j, nid, s in zip(
            batch["qidx"].to_numpy(), batch["neighbor_id"].to_numpy(), batch["score"].to_numpy()
        ):
            j = int(j)
            if exclude_self and int(nid) == int(query_ids[j]):
                continue
            # heap keyed by (score, -neighbor_id): on ties prefer smaller id
            heapq.heappush(heaps[j], (float(s), -int(nid)))
            if len(heaps[j]) > k:
                heapq.heappop(heaps[j])

    rows_q, rows_n, rows_s, rows_r = [], [], [], []
    for j in range(qn.shape[0]):
        ranked = sorted(heaps[j], key=lambda t: (-t[0], -t[1]))
        for r, (s, negid) in enumerate(ranked[:k], start=1):
            rows_q.append(int(query_ids[j]))
            rows_n.append(-negid)
            rows_s.append(round(s, 4))
            rows_r.append(r)
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "score": pa.array(rows_s, pa.float64()),
            "rank": pa.array(rows_r, pa.int64()),
        }
    )


def hyperplane_bucket_batch(
    batch: pa.Table, planes: np.ndarray, id_col: str = "vec_id"
) -> pa.Table:
    """Assign each vector a signed-projection LSH bucket (uint→int64 key)."""
    m = _normalize(_embedding_matrix(batch))
    bits = (m @ planes.T) >= 0  # (n, nbits)
    key = np.zeros(m.shape[0], dtype=np.uint64)
    for i in range(planes.shape[0]):
        key = (key << np.uint64(1)) | bits[:, i].astype(np.uint64)
    return pa.table(
        {
            "bucket": pa.array(key.view(np.int64)),
            id_col: batch[id_col],
            "embedding": batch["embedding"],
        }
    )


def make_planes(dim: int, n_bits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 5,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k: each query scans only its hyperplane bucket.

    At scale the bucket column partitions the corpus (groupby-shuffle once,
    reused across query batches); here the query set is broadcast and each
    corpus batch scores only same-bucket queries.
    """
    dim = np.asarray(queries).shape[1]
    planes = make_planes(dim, n_bits, seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qbits = (qn @ planes.T) >= 0
    qkey = np.zeros(qn.shape[0], dtype=np.uint64)
    for i in range(n_bits):
        qkey = (qkey << np.uint64(1)) | qbits[:, i].astype(np.uint64)
    qkey = qkey.view(np.int64)
    q_ref = ray.put((qn, qkey))
    planes_ref = ray.put(planes)

    def score(batch: pa.Table) -> pa.Table:
        q, qk = ray.get(q_ref)
        pl = ray.get(planes_ref)
        bucketed = hyperplane_bucket_batch(batch, pl, id_col)
        m = _normalize(_embedding_matrix(bucketed))
        ids = bucketed[id_col].to_numpy()
        bkt = bucketed["bucket"].to_numpy()
        out_q, out_n, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = bkt == qk[j]
            if not mask.any():
                continue
            sims = m[mask] @ q[j]
            sub_ids = ids[mask]
            top = _topk_tie_safe(sims, min(k + 1, sims.shape[0]))
            out_q.extend([j] * top.shape[0])
            out_n.extend(sub_ids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table(
            {
                "qidx": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    heaps: dict[int, list] = {j: [] for j in range(qn.shape[0])}
    for batch in embeddings.map_batches(score, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=8192
    ):
        for j, nid, s in zip(
            batch["qidx"].to_numpy(), batch["neighbor_id"].to_numpy(), batch["score"].to_numpy()
        ):
            j = int(j)
            if int(nid) == int(query_ids[j]):
                continue
            heapq.heappush(heaps[j], (float(s), -int(nid)))
            if len(heaps[j]) > k:
                heapq.heappop(heaps[j])
    rows_q, rows_n, rows_s, rows_r = [], [], [], []
    for j in range(qn.shape[0]):
        ranked = sorted(heaps[j], key=lambda t: (-t[0], -t[1]))
        for r, (s, negid) in enumerate(ranked[:k], start=1):
            rows_q.append(int(query_ids[j]))
            rows_n.append(-negid)
            rows_s.append(round(s, 4))
            rows_r.append(r)
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "score": pa.array(rows_s, pa.float64()),
            "rank": pa.array(rows_r, pa.int64()),
        }
    )


def exact_cosine_pairs(
    embeddings: ray.data.Dataset,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
) -> pa.Table:
    """EXACT all-pairs cosine ≥ threshold — the SQL-checkable baseline.

    Streams corpus batches against a broadcast normalized matrix (block ×
    full matmul). The broadcast side is the whole corpus, so this is the
    small-to-medium baseline; the LSH-bucketed variant
    (:func:`embedding_near_dup_pairs`) is the 100 TB path.
    """
    mats, ids = [], []
    for batch in embeddings.iter_batches(batch_format="pyarrow", batch_size=8192):
        mats.append(_embedding_matrix(batch))
        ids.append(batch[id_col].to_numpy())
    m = _normalize(np.concatenate(mats))
    vid = np.concatenate(ids)
    ref = ray.put((m, vid))

    def score(batch: pa.Table) -> pa.Table:
        fm, fids = ray.get(ref)
        bm = _normalize(_embedding_matrix(batch))
        bids = batch[id_col].to_numpy()
        sims = bm @ fm.T  # (nb, N)
        ii, jj = np.nonzero(sims >= threshold)
        a, b = bids[ii], fids[jj]
        keep = a < b  # canonical + drops self
        a, b = a[keep], b[keep]
        vals = sims[ii[keep], jj[keep]]
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "score": pa.array(np.round(vals, 4), pa.float64()),
            }
        )

    out = embeddings.map_batches(score, batch_format="pyarrow")
    import pyarrow as _pa

    batches = [b for b in out.iter_batches(batch_format="pyarrow", batch_size=65536)]
    if not batches:
        return _pa.table(
            {"a": _pa.array([], _pa.int64()), "b": _pa.array([], _pa.int64()), "score": _pa.array([], _pa.float64())}
        )
    return _pa.concat_tables(batches)


def embedding_near_dup_pairs(
    embeddings: ray.data.Dataset,
    *,
    threshold: float = 0.98,
    n_bits: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """All pairs with cosine ≥ threshold via hyperplane-bucket grouping +
    exact in-bucket verification (near-dup vectors almost surely share all
    sign bits; multi-probe variants can push recall further)."""
    first = embeddings.take_batch(1, batch_format="pyarrow")
    dim = _embedding_matrix(first).shape[1]
    planes = make_planes(dim, n_bits, seed)

    bucketed = embeddings.map_batches(
        hyperplane_bucket_batch, fn_kwargs={"planes": planes, "id_col": id_col},
        batch_format="pyarrow",
    )

    def pair_bucket(group: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(group))
        ids = group[id_col].to_numpy()
        n = m.shape[0]
        if n < 2:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        sims = m @ m.T
        iu, ju = np.triu_indices(n, k=1)
        vals = sims[iu, ju]
        mask = vals >= threshold
        iu, ju, vals = iu[mask], ju[mask], vals[mask]
        a, b = ids[iu], ids[ju]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64()),
                "score": pa.array(np.round(vals, 4), pa.float64()),
            }
        )

    pairs = bucketed.groupby("bucket").map_groups(
        pair_bucket, batch_format="pyarrow"
    ).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.schema(
                [pa.field("a", pa.int64()), pa.field("b", pa.int64()), pa.field("score", pa.float64())]
            ).empty_table()
        )
    return (
        pairs.groupby(["a", "b"]).max("score").rename_columns({"max(score)": "score"})
    )
