"""Signature stage — per-worker cached state, two deployment shapes.

Per-worker state (built once, like the DCT coefficient matrix in Europa's
static ctor, ``/root/reference/Api/Implementations/SimilarImages/
ImageHashs/PerceptualHash.cs:24-61``): the 128 MinHash permutation seeds and
the engine config. Per batch: sha256, tokenize (token-capped), 5-gram
shingles, MinHash-128 + SimHash-64 — all NumPy-vectorized over flat
token/shingle arrays with private-L2-sized chunks. Content is dropped from
the output so no downstream shuffle ever moves file bodies.

Two shapes (see :func:`signatures`): the default task-based form (state in a
module cache, once per Ray worker process — no pool startup cost) and the
classic actor pool (``map_batches(SignatureStage, concurrency=(n, m))``) for
genuinely expensive per-actor state or per-actor resource isolation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.functions.sig import make_perm_seeds, minhash_signatures
from europa_ray.functions.text import shingles, tokenize_arrow, truncate_rows, unique_per_row
from europa_ray.util import hex_to_u64, sha256_hex_arrow

SIG_DTYPE = np.uint32  # low 32 bits of each minhash slot: halves shuffle
# volume; P(component collision) = 2^-32, immaterial for Jaccard estimates.


class SignatureStage:
    def __init__(
        self,
        cfg: EngineConfig = DEFAULT_CONFIG,
        id_cols: tuple[str, ...] = ("repo", "path", "commit"),
        compute_fuzzy: bool = True,
        compute_minhash: bool = True,
    ):
        from europa_ray.functions.registry import get_signature, signature_order_sensitive

        self.cfg = cfg
        self.id_cols = id_cols
        self.perm_seeds = make_perm_seeds(cfg.num_perm, cfg.seed)
        # config-selected 64-bit fuzzy algorithm (keyed-DI swap, §2.10/M6);
        # the output column keeps the name "simhash" whatever the algorithm.
        # compute_fuzzy=False / compute_minhash=False skip the respective
        # kernel (and its column) entirely — the MinHash flagship never
        # reads simhash, the SimHash pass never reads minhash.
        self.compute_fuzzy = compute_fuzzy
        self.compute_minhash = compute_minhash
        self.fuzzy_fn = get_signature(cfg.fuzzy_algo)
        # order-sensitive algorithms (diffhash) get the document-order
        # shingle stream; set-semantics algorithms (simhash) the sorted-
        # unique set — a sorted stream collapses anchor-comparison hashes
        self.fuzzy_ordered = signature_order_sensitive(cfg.fuzzy_algo)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        content = batch["content"]
        sha = sha256_hex_arrow(content)
        keep = np.array([h is not None for h in sha], dtype=bool)

        th, off = tokenize_arrow(content)
        th, off = truncate_rows(th, off, cfg.max_sig_tokens)
        sh, soff = shingles(th, off, cfg.shingle_k)
        ush, uoff = unique_per_row(sh, soff)
        if not self.compute_minhash:
            sig = None
        elif cfg.minhash_mode == "oph":
            from europa_ray.functions.sig import minhash_signatures_oph

            sig = minhash_signatures_oph(ush, uoff, cfg.num_perm, cfg.seed)
        else:
            sig = minhash_signatures(ush, uoff, self.perm_seeds)  # uint32 (n, p)
        if not self.compute_fuzzy:
            sim = None
        elif self.fuzzy_ordered:
            sim = self.fuzzy_fn(sh, soff)
        else:
            sim = self.fuzzy_fn(ush, uoff)
        n_tokens = np.diff(off)

        sha_kept = [h for h in sha if h is not None]
        # int64 bit-view: Ray groupby/join keys must be int64 (uint64 columns
        # degrade to pickled-object extension arrays in shuffles)
        node = hex_to_u64(sha_kept).view(np.int64)

        cols: dict[str, pa.Array] = {}
        for c in self.id_cols:
            if c in batch.column_names:
                cols[c] = batch[c].filter(pa.array(keep))
        cols["sha256"] = pa.array(sha_kept, pa.string())
        cols["node"] = pa.array(node)
        cols["n_tokens"] = pa.array(n_tokens[keep])
        if sig is not None:
            cols["minhash"] = pack_sigs(sig[keep])
        if sim is not None:
            cols["simhash"] = pa.array(sim[keep].view(np.int64))
        return pa.table(cols)


def default_pool_size(reserve: int = 2, cap: int = 64) -> tuple[int, int]:
    """Autoscaling actor-pool bounds that can never starve the pipeline:
    max = cluster CPUs − ``reserve`` (read/shuffle tasks need CPUs too — a
    pool equal to the CPU count deadlocks the streaming executor), min = 1.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    size = max(1, min(cap, cpus - reserve))
    # fixed-size pool (min == max): autoscaling from 1 wastes several seconds
    # of ramp-up per stage; reserve ≥ 2 CPUs stay free so upstream reads and
    # shuffle aggregators always make progress (no starvation deadlock)
    return (size, size)


_STAGE_CACHE: dict[tuple, SignatureStage] = {}


def signature_task(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG,
                   id_cols: tuple[str, ...] = ("repo", "path", "commit"),
                   compute_fuzzy: bool = True,
                   compute_minhash: bool = True) -> pa.Table:
    """Task-based signature stage: per-worker-process cached state.

    The permutation table still lives once per worker (module-level cache —
    same once-per-worker semantics as actor ``__init__``) but runs in Ray's
    shared task workers: no dedicated actor-pool startup per pipeline, which
    profiling showed costs several seconds per stage on a cold pool.
    """
    # key on the WHOLE frozen config (hashable dataclass): a hand-picked
    # field subset silently reuses a stale stage when two configs differ
    # only in an unlisted field (e.g. max_sig_tokens)
    key = (cfg, id_cols, compute_fuzzy, compute_minhash)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = SignatureStage(cfg, id_cols, compute_fuzzy, compute_minhash)
        _STAGE_CACHE[key] = stage
    return stage(batch)


def signatures(
    files,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    concurrency=None,
    use_actor_pool: bool = False,
    compute_fuzzy: bool = True,
    compute_minhash: bool = True,
):
    """Attach the signature stage to a files Dataset.

    Default is the task-based form (warm shared workers, per-process cached
    permutation state). ``use_actor_pool=True`` switches to a dedicated
    ``map_batches(SignatureStage, concurrency=...)`` actor pool — the right
    shape when per-actor state is genuinely expensive (models, indexes) or
    needs resource isolation (``num_cpus``/``num_gpus`` per actor); for this
    stage's tiny seed table the pool's startup cost outweighs its benefit.
    """
    if use_actor_pool:
        return files.map_batches(
            SignatureStage,
            fn_constructor_kwargs={
                "cfg": cfg,
                "id_cols": id_cols,
                "compute_fuzzy": compute_fuzzy,
                "compute_minhash": compute_minhash,
            },
            concurrency=concurrency or default_pool_size(),
            batch_size=cfg.batch_size,
            batch_format="pyarrow",
        )
    return files.map_batches(
        signature_task,
        fn_kwargs={
            "cfg": cfg,
            "id_cols": id_cols,
            "compute_fuzzy": compute_fuzzy,
            "compute_minhash": compute_minhash,
        },
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
    )


def pack_sigs(mat: np.ndarray) -> pa.Array:
    """(n, p) uint32 signature matrix → binary column (p*4-byte blobs).

    Plain ``binary`` (not fixed-size-list) so signatures survive Acero joins
    as payload columns. Built directly from buffers — no per-row Python.
    """
    n, p = mat.shape
    data = np.ascontiguousarray(mat, dtype=SIG_DTYPE).tobytes()
    offsets = (np.arange(n + 1, dtype=np.int32) * (p * 4)).tobytes()
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(data)]
    )


def minhash_matrix(tbl: pa.Table, num_perm: int) -> np.ndarray:
    """(n, num_perm) uint32 matrix from the packed binary ``minhash`` column."""
    col = tbl["minhash"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = num_perm * 4
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset : col.offset + len(col) + 1]
    if len(col) == 0:
        return np.empty((0, num_perm), dtype=SIG_DTYPE)
    if (np.diff(offs) == width).all():
        data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
        return np.frombuffer(data.tobytes(), dtype=SIG_DTYPE).reshape(-1, num_perm)
    # non-uniform (shouldn't happen): per-row fallback
    return np.stack([np.frombuffer(x, dtype=SIG_DTYPE) for x in col.to_pylist()])
