"""Long-shared-substring pass (north rule "suffix-array" pass).

Role: catch pairs sharing a ≥ ``substr_min_tokens`` verbatim token block that
overall Jaccard misses (the sequence-matching role SoundFingerprinting plays
in the reference's audio path, ``/root/reference/Api/Implementations/
SimilarAudios/AudioHashGenerator.cs:12-29`` — stride-sampled sub-sequence
fingerprints voted into matches).

Mechanism (winnowing-style):

1. Per batch: w-gram (w = ``substr_window``) rolling hashes over the token
   stream; keep the deterministic sample ``h % substr_sample_mod == 0``.
   A shared block of L tokens contains L−w+1 shared w-grams ⇒ expected
   (L−w+1)/mod shared *sampled* grams — collision is near-certain for
   L ≥ 256, w = 16, mod = 8. Fully vectorized: zero-copy tokenizer +
   flat-window gram combine, no per-row Python.
2. ``groupby(sample_key)`` over colliding keys → candidate node pairs.
3. Verify: recompute ordered w-gram arrays for candidate nodes only (second
   streaming pass, broadcast candidate membership), then per pair find the
   longest run of consecutive w-grams of one doc present in the other's
   gram set (NumPy isin + run-length). Shared run of r grams ⇔ shared
   substring of r + w − 1 tokens. Verification runs through
   :mod:`europa_ray.stages.pairverify`: driver-local below a byte budget,
   cogroup ``groupby(pair_idx).map_groups`` shuffle above it — no unguarded
   driver gather (equivalence-tested by forcing the budget to 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.functions.text import shingles, tokenize_arrow
from europa_ray.stages.lsh import PAIRS_SCHEMA
from europa_ray.stages.pairverify import verify_pairs_chunked
from europa_ray.util import default_num_partitions, hex_to_u64, sha256_hex_arrow


def wgram_payload(content: pa.Array, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Ordered per-row w-gram rolling hashes (flat values + row offsets)."""
    th, off = tokenize_arrow(content)
    return shingles(th, off, w, short_row_fallback=False)


def explode_sampled_grams(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """files batch → (sample_key, node) rows for sampled w-grams — all
    vectorized (tokenize_arrow → flat w-grams → mod-sample → per-row unique)."""
    empty = pa.table(
        {"sample_key": pa.array([], pa.int64()), "node": pa.array([], pa.int64())}
    )
    content = batch["content"]
    sha = sha256_hex_arrow(content)
    if not any(h is not None for h in sha):
        return empty
    n_rows = batch.num_rows
    # node per row; rows with null sha (empty content) have no tokens and
    # therefore no grams — their slot is never read
    node_all = np.zeros(n_rows, dtype=np.int64)
    idx = [i for i, h in enumerate(sha) if h is not None]
    node_all[idx] = hex_to_u64([sha[i] for i in idx]).view(np.int64)

    g, goff = wgram_payload(content, cfg.substr_window)
    if g.shape[0] == 0:
        return empty
    # winnow sample, preserving row structure
    mod = np.uint64(cfg.substr_sample_mod)
    keep = g % mod == 0
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(goff))
    g, row_of = g[keep], row_of[keep]
    if g.shape[0] == 0:
        return empty
    # unique per row (a doc contributes each sampled gram once)
    order = np.lexsort((g, row_of))
    g, row_of = g[order], row_of[order]
    uniq = np.ones(g.shape[0], dtype=bool)
    uniq[1:] = (g[1:] != g[:-1]) | (row_of[1:] != row_of[:-1])
    g, row_of = g[uniq], row_of[uniq]
    return pa.table(
        {
            "sample_key": pa.array(g.view(np.int64)),
            "node": pa.array(node_all[row_of]),
        }
    )


def _pair_gram_group(group: pa.Table, max_nodes: int = 64) -> pa.Table:
    nodes = np.unique(group["node"].to_numpy())
    n = nodes.shape[0]
    if n < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if n > max_nodes:
        # extremely common gram (boilerplate): window-link instead of n²
        iu = np.arange(n - 1)
        ju = iu + 1
    else:
        iu, ju = np.triu_indices(n, k=1)
    return pa.table({"a": pa.array(nodes[iu]), "b": pa.array(nodes[ju])})


def _longest_shared_run(ga: np.ndarray, gb: np.ndarray) -> int:
    """Longest run of consecutive w-grams of gb present in ga (in grams)."""
    if ga.shape[0] == 0 or gb.shape[0] == 0:
        return 0
    present = np.isin(gb, ga)
    if not present.any():
        return 0
    # run lengths of True
    changes = np.diff(np.concatenate([[0], present.view(np.int8), [0]]))
    starts = np.nonzero(changes == 1)[0]
    ends = np.nonzero(changes == -1)[0]
    return int((ends - starts).max())


def substring_pairs(
    files: ray.data.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int | None = None,
    driver_max_payload_bytes: int = 512 << 20,
    driver_max_cand_rows: int = 5_000_000,
) -> ray.data.Dataset:
    """files Dataset → verified long-shared-substring pairs."""
    if num_partitions is None:
        num_partitions = default_num_partitions()
    grams_ds = files.map_batches(
        explode_sampled_grams, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )
    from europa_ray.stages.lsh import duplicated_keys, filter_by_key_array, semi_join_keys

    dup_keys = duplicated_keys(grams_ds.select_columns(["sample_key"]), "sample_key")
    if dup_keys is not None:
        if dup_keys.shape[0] == 0:
            return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
        hot = filter_by_key_array(grams_ds, dup_keys, "sample_key")
    else:
        collisions = (
            grams_ds.select_columns(["sample_key"])
            .groupby("sample_key")
            .count()
            .rename_columns({"count()": "n"})
            .filter(expr="n > 1")
            .materialize()
        )
        if collisions.count() == 0:
            return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
        hot = semi_join_keys(grams_ds, collisions, "sample_key", num_partitions=num_partitions)
    cand = (
        hot.groupby("sample_key")
        .map_groups(_pair_gram_group, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .rename_columns({"count()": "n_shared_samples"})
        .materialize()  # candidate pairs only (small)
    )
    if cand.count() == 0:
        return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())

    w = cfg.substr_window
    min_run = cfg.substr_min_tokens - w + 1

    def metric(ga: np.ndarray, gb: np.ndarray) -> float | None:
        run = _longest_shared_run(ga, gb)
        if run < min_run:
            return None
        return (run + w - 1) / max(1, min(ga.shape[0], gb.shape[0]) + w - 1)

    def emit(na: int, nb: int, est: float) -> tuple:
        lo, hi = (na, nb) if na < nb else (nb, na)
        return (lo, hi, est, "substr")

    # candidate (a, b) list gathered in enforced-budget chunks — bounded
    # even if an upstream cap is misconfigured
    return verify_pairs_chunked(
        files,
        cand,
        lambda col: wgram_payload(col, w),
        metric,
        PAIRS_SCHEMA,
        emit,
        driver_max_payload_bytes=driver_max_payload_bytes,
        chunk_rows=driver_max_cand_rows,
    )
