"""Near-duplicate detection + clustering — the flagship (SURVEY.md §3.2).

Engine shape (north rule)::

    read_parquet → filters → SignatureStage actor pool (sha256 + tokenize +
    5-gram shingles + MinHash-128 + SimHash-64, content dropped)
        → band explode (×16) → groupby(band_key) over colliding keys
        → in-band pairing with inline Jaccard verify + hot-band windowing
        → pair dedup (groupby(a,b))
        → connected components (driver union-find / distributed min-label)
        → member assembly + singleton suppression → sorted clusters

Cluster semantics vs the reference: one node per distinct content
(exact-dup coalescing before similarity, ``SimilarImageFinder.cs:161-165``);
clusters are true CCs with canonical ``cluster_id = min(node)`` rendered as
16-hex; a group is emitted when it has ≥ 2 member *rows* — this covers both
multi-content near-dup clusters and single-content exact-dup groups, matching
the reference's ≥2-files emit rule (``SimilarImageFinder.cs:119``).

Scale notes: label and dup-sha maps are broadcast via ``ray.put`` (they are
duplicate-only, ≪ corpus). For corpora where even the duplicate set exceeds
worker memory, flip the final assembly to the join-based path
(``exact_dup_clusters``-style count-join) — the shuffles are metadata-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.stages.filters import apply_filters
from europa_ray.stages.lsh import candidate_pairs
from europa_ray.stages.signatures import signatures
from europa_ray.state.unionfind import components



def near_dup_pipeline(
    files: ray.data.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_partitions: int | None = None,
    extra_pairs: ray.data.Dataset | None = None,
) -> dict[str, ray.data.Dataset]:
    """Run the full pipeline; returns {"pairs": ..., "clusters": ...}.

    ``extra_pairs``: optional additional verified edge Datasets (e.g. the
    SimHash or shared-substring passes) unioned into the CC stage.
    """
    ds = apply_filters(files, cfg)
    sigs = signatures(ds, cfg, id_cols=id_cols)
    # the signature table is consumed twice (pairs + member assembly):
    # materialize once so the actor pool doesn't recompute per consumer
    sigs = sigs.materialize()

    pairs = candidate_pairs(sigs, cfg, num_partitions=num_partitions)
    if extra_pairs is not None:
        from europa_ray.stages.lsh import dedupe_pairs

        pairs = dedupe_pairs(pairs.union(extra_pairs), source=None)
    pairs = pairs.materialize()  # verified duplicate pairs: ≪ corpus

    labels = components(pairs, driver_max_edges=cfg.cc_driver_max_edges)

    clusters = assemble_members(sigs, labels, cfg, id_cols=id_cols)
    return {"pairs": pairs, "clusters": clusters}


def exact_jaccard_pairs(
    files: ray.data.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """n-gram Jaccard as a first-class operator: LSH candidate pairs
    re-verified with TRUE 5-gram-set Jaccard (not the MinHash estimate).

    Candidates come from the banding pass (recall ≥ 0.99 at τ per the golden
    tests); the exact verification recomputes shingle sets for candidate
    nodes only (second streaming pass, broadcast candidate set) — the same
    gather pattern as the substring pass.
    """
    from europa_ray.functions.text import shingles, tokenize, unique_per_row
    from europa_ray.stages.lsh import PAIRS_SCHEMA
    from europa_ray.util import hex_to_u64, sha256_hex

    ds = apply_filters(files, cfg)
    sigs = signatures(ds, cfg, id_cols=id_cols).materialize()
    cand = candidate_pairs(sigs, cfg, num_partitions=num_partitions).materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
    cand_tbl = cand.to_pandas()
    wanted = set(cand_tbl.a.tolist()) | set(cand_tbl.b.tolist())
    wanted_ref = ray.put(wanted)
    k = cfg.shingle_k

    def gather(batch: pa.Table) -> pa.Table:
        want = ray.get(wanted_ref)
        texts = batch["content"].to_pylist()
        sha = sha256_hex(texts)
        out_n, out_s = [], []
        seen = set()
        for h, t in zip(sha, texts):
            if h is None:
                continue
            nd = int(hex_to_u64([h]).view(np.int64)[0])
            if nd not in want or nd in seen:
                continue
            seen.add(nd)
            th, off = tokenize([t])
            sh_, soff = shingles(th, off, k)
            ush, _ = unique_per_row(sh_, soff)
            out_n.append(nd)
            out_s.append(ush.view(np.int64).tolist())
        return pa.table(
            {
                "node": pa.array(out_n, pa.int64()),
                "shingles": pa.array(out_s, pa.list_(pa.int64())),
            }
        )

    sets: dict[int, set] = {}
    for batch in ds.map_batches(gather, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=256
    ):
        for nd, s in zip(batch["node"].to_pylist(), batch["shingles"].to_pylist()):
            sets.setdefault(nd, set(s))

    out_a, out_b, out_j = [], [], []
    for a, b in zip(cand_tbl.a.tolist(), cand_tbl.b.tolist()):
        sa, sb = sets.get(a), sets.get(b)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter) if inter else 0.0
        if jac >= cfg.jaccard_threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(jac, 6))
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )
    )


def assemble_members(
    sigs: ray.data.Dataset,
    labels: dict[int, int],
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
) -> ray.data.Dataset:
    """Join cluster labels back to member rows and suppress singletons.

    - node in ``labels`` → near-dup component member (cluster = label).
    - node not in ``labels`` but whose sha has ≥2 rows → exact-dup-only
      group (cluster = own node).
    - else singleton → dropped (A7, ``SimilarImageFinder.cs:119``).
    """
    labels_ref = ray.put(labels)

    # exact-dup sha counts (aggregate over nodes: small, duplicate-only)
    counts = (
        sigs.groupby("node").count().rename_columns({"count()": "n_rows"}).filter(expr="n_rows > 1")
    )
    dup_nodes = {}
    for batch in counts.iter_batches(batch_format="pyarrow", batch_size=65536):
        dup_nodes.update(
            zip(batch["node"].to_numpy().tolist(), batch["n_rows"].to_numpy().tolist())
        )
    dup_ref = ray.put(dup_nodes)

    def tag(batch: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        dup = ray.get(dup_ref)
        nodes = batch["node"].to_numpy()
        n = len(nodes)
        cluster = np.zeros(n, dtype=np.uint64)
        keep = np.zeros(n, dtype=bool)
        source = [""] * n
        for i, nd in enumerate(nodes.tolist()):
            if nd in lab:
                cluster[i], keep[i], source[i] = lab[nd], True, "lsh"
            elif nd in dup:
                cluster[i], keep[i], source[i] = nd, True, "exact"
        mask = pa.array(keep)
        sel = batch.select([c for c in (*id_cols, "sha256", "node") if c in batch.column_names]).filter(mask)
        kept_clusters = cluster[keep]
        kept_sources = [s for s, k in zip(source, keep) if k]
        sel = sel.append_column("cluster_id", pa.array([f"{c:016x}" for c in kept_clusters], pa.string()))
        sel = sel.append_column("source", pa.array(kept_sources, pa.string()))
        return sel

    members = sigs.map_batches(tag, batch_format="pyarrow")
    sort_cols = ["cluster_id", *[c for c in id_cols]]
    return members.sort(sort_cols)
