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
   L ≥ 256, w = 16, mod = 8.
2. ``groupby(sample_key)`` over colliding keys → candidate node pairs.
3. Verify: recompute w-gram hash arrays for candidate nodes only (second
   streaming pass over the corpus, filtered by a broadcast candidate-node
   set), then per pair find the longest run of consecutive w-grams of one
   doc present in the other's gram set (NumPy isin + run-length). Shared
   run of r grams ⇔ shared substring of r + w − 1 tokens.

The verify step gathers only candidate-node gram arrays (bounded by the
candidate count, ≪ corpus). For corpora where even candidates are huge,
partition the pair verification by hash(pair) into a map stage over
``ray.put`` shards — same math, no driver gather.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.functions.text import _poly_combine, tokenize
from europa_ray.stages.lsh import PAIRS_SCHEMA
from europa_ray.util import default_num_partitions, hex_to_u64, sha256_hex


def _wgram_hashes(texts: list[str], w: int) -> list[np.ndarray]:
    th, off = tokenize(texts)
    out = []
    for i in range(len(texts)):
        seg = th[off[i] : off[i + 1]]
        out.append(_poly_combine(seg, w) if seg.shape[0] >= w else np.empty(0, np.uint64))
    return out


def explode_sampled_grams(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """files batch → (sample_key, node) rows for sampled w-grams."""
    texts = batch["content"].to_pylist()
    sha = sha256_hex(texts)
    keys: list[np.ndarray] = []
    nodes: list[np.ndarray] = []
    grams = _wgram_hashes(texts, cfg.substr_window)
    mod = np.uint64(cfg.substr_sample_mod)
    for h, g in zip(sha, grams):
        if h is None or g.shape[0] == 0:
            continue
        samp = np.unique(g[g % mod == 0])
        if samp.shape[0] == 0:
            continue
        keys.append(samp.view(np.int64))
        nodes.append(np.full(samp.shape[0], int(hex_to_u64([h]).view(np.int64)[0]), dtype=np.int64))
    if not keys:
        return pa.table(
            {"sample_key": pa.array([], pa.int64()), "node": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "sample_key": pa.array(np.concatenate(keys)),
            "node": pa.array(np.concatenate(nodes)),
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
    files: ray.data.Dataset, cfg: EngineConfig = DEFAULT_CONFIG, *, num_partitions: int | None = None
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

    cand_tbl = cand.to_pandas()
    cand_nodes = set(cand_tbl.a.tolist()) | set(cand_tbl.b.tolist())
    cand_ref = ray.put(cand_nodes)
    w = cfg.substr_window

    def gather_grams(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        texts = batch["content"].to_pylist()
        sha = sha256_hex(texts)
        nodes64 = [
            None if h is None else int(hex_to_u64([h]).view(np.int64)[0]) for h in sha
        ]
        rows_n, rows_g = [], []
        seen = set()
        for nd, t in zip(nodes64, texts):
            if nd is None or nd not in wanted or nd in seen:
                continue
            seen.add(nd)  # one gram array per distinct content within batch
            g = _wgram_hashes([t], w)[0]
            rows_n.append(nd)
            rows_g.append(g.view(np.int64))
        return pa.table(
            {
                "node": pa.array(rows_n, pa.int64()),
                "grams": pa.array([g.tolist() for g in rows_g], pa.list_(pa.int64())),
            }
        )

    gram_map: dict[int, np.ndarray] = {}
    for batch in files.map_batches(gather_grams, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=256
    ):
        for nd, g in zip(batch["node"].to_pylist(), batch["grams"].to_pylist()):
            if nd not in gram_map:
                gram_map[nd] = np.asarray(g, dtype=np.int64).view(np.uint64)

    min_run = cfg.substr_min_tokens - w + 1
    out_a, out_b, out_est = [], [], []
    for a, b in zip(cand_tbl.a.tolist(), cand_tbl.b.tolist()):
        ga, gb = gram_map.get(a), gram_map.get(b)
        if ga is None or gb is None:
            continue
        run = _longest_shared_run(ga, gb)
        if run >= min_run:
            lo, hi = (a, b) if a < b else (b, a)
            out_a.append(lo)
            out_b.append(hi)
            out_est.append((run + w - 1) / max(1, min(ga.shape[0], gb.shape[0]) + w - 1))
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "est": pa.array(out_est, pa.float64()),
                "source": pa.array(["substr"] * len(out_a), pa.string()),
            }
        )
    )
