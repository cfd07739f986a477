"""Vendored-directory detection: group (repo, directory) pairs whose file
CONTENT-DIGEST SETS are identical — the Merkle-style "this directory is a
verbatim vendored copy of that one" signal a source-code corpus needs
between whole-repo fork detection (:mod:`europa_ray.pipelines.forks`) and
per-file exact dedup (:mod:`europa_ray.pipelines.exact`): a library copied
into ``third_party/`` matches at directory granularity even when neither
whole repos nor enough loose files pair up.

Identity: a directory is its SET of distinct file-content sha256s (names
inside the dir don't matter — renames survive vendoring). The set key is
``(xor of digest-u64s, n_files)``: XOR is order-independent, overflow-free,
and exact over DISTINCT elements (the set is distinct by construction);
DuckDB's ``bit_xor`` computes the same key, so the oracle is value-exact
INCLUDING any astronomically-unlikely XOR collision (both sides group by
the same key). Output: one row per (repo, dir) member of a group with ≥ 2
members — ``(group_hash, repo, dir, n_files)`` sorted.

Engine shape (digest-space only)::

    files → sha256 (keep repo, path) → dir = path-prefix
        → groupby(repo, dir, sha256) distinct          [metadata shuffle]
        → per-(repo, dir) xor + count                  [see dispatch]
        → group by (xor, n_files), keep groups ≥ 2

Size dispatch: the distinct (repo, dir, digest) table is file-count-sized;
below ``driver_max_rows`` it is gathered and reduced with one lexsort +
``np.bitwise_xor.reduceat`` (no per-row Python). Above it, the per-dir
reduction runs as a bucketed ``groupby(bucket).map_groups`` cogroup
(vectorized inside each bucket — the crossdup.py pattern; per-(repo,dir)
``map_groups`` would pay Python per DIRECTORY), and only the dir-count-
sized summary table (one row per directory, ≪ corpus) is gathered for the
final grouping. Forced-budget-0 equivalence tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.stages.filters import apply_filters
from europa_ray.stages.hash_stage import add_sha256
from europa_ray.util import default_num_partitions, hex_to_u64_arrow

GROUPS_SCHEMA = pa.schema(
    [
        ("group_hash", pa.int64()),
        ("repo", pa.string()),
        ("dir", pa.string()),
        ("n_files", pa.int64()),
    ]
)


def _dir_rows(batch: pa.Table) -> pa.Table:
    """(repo, dir, node) — dir is everything before the LAST '/', '' for
    top-level paths; node is the int64 view of the digest's leading 64
    bits (the engine's content identity)."""
    import pyarrow.compute as pc

    # strip the filename: drop everything from the last '/'; '' when the
    # path has no directory component
    paths = batch["path"]
    has_slash = pc.match_substring(paths, "/")
    dirs = pc.if_else(
        has_slash,
        pc.replace_substring_regex(paths, "/[^/]*$", ""),
        pa.scalar("", pa.string()),
    )
    nodes = hex_to_u64_arrow(batch["sha256"]).view(np.int64)
    return pa.table(
        {
            "repo": batch["repo"],
            "dir": dirs,
            "node": pa.array(nodes, pa.int64()),
        }
    )


def _groups_from_summary(
    xors: np.ndarray, counts: np.ndarray, repos: np.ndarray, dirs: np.ndarray,
    min_group: int,
) -> pa.Table:
    """Final grouping over the per-directory summary (one row per dir)."""
    order = np.lexsort((counts, xors))
    xors, counts, repos, dirs = xors[order], counts[order], repos[order], dirs[order]
    new_g = np.ones(xors.shape[0], dtype=bool)
    new_g[1:] = (xors[1:] != xors[:-1]) | (counts[1:] != counts[:-1])
    starts = np.flatnonzero(new_g)
    sizes = np.diff(np.append(starts, xors.shape[0]))
    keep_group = sizes >= min_group
    keep_row = np.repeat(keep_group, sizes)
    if not keep_row.any():
        return GROUPS_SCHEMA.empty_table()
    gx, gc, gr, gd = xors[keep_row], counts[keep_row], repos[keep_row], dirs[keep_row]
    order = np.lexsort((gd, gr, gc, gx))
    return pa.table(
        {
            "group_hash": pa.array(gx[order], pa.int64()),
            "repo": pa.array(gr[order], pa.string()),
            "dir": pa.array(gd[order], pa.string()),
            "n_files": pa.array(gc[order], pa.int64()),
        }
    )


def vendored_dir_groups(
    files: ray.data.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    min_group: int = 2,
    driver_max_rows: int = 50_000_000,
    num_partitions: int | None = None,
) -> pa.Table:
    """Groups of (repo, dir) with identical file-digest sets (see module
    docstring)."""
    nparts = num_partitions or default_num_partitions()
    ds = apply_filters(files, cfg)
    hashed = ds.map_batches(
        add_sha256, fn_kwargs={"keep_cols": ("repo", "path")}, batch_format="pyarrow"
    ).map_batches(_dir_rows, batch_format="pyarrow")

    # Driver path: stream RAW (repo, dir, node) rows and dedupe in numpy —
    # skipping the cold Ray hash-shuffle groupby whose aggregator-actor
    # startup (tens of seconds in a fresh session) never amortizes below
    # the budget. Budget is on raw rows, stricter than the distinct count.
    repo_p: list[np.ndarray] = []
    dir_p: list[np.ndarray] = []
    node_p: list[np.ndarray] = []
    total = 0
    over = False
    for b in hashed.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += b.num_rows
        if total > driver_max_rows:
            over = True
            break
        repo_p.append(np.asarray(b["repo"].to_pylist(), dtype=object))
        dir_p.append(np.asarray(b["dir"].to_pylist(), dtype=object))
        node_p.append(b["node"].to_numpy())

    if not over:
        if not repo_p:
            return GROUPS_SCHEMA.empty_table()
        repos = np.concatenate(repo_p)
        dirs = np.concatenate(dir_p)
        nodes = np.concatenate(node_p)
        order = np.lexsort((nodes, dirs, repos))
        repos, dirs, nodes = repos[order], dirs[order], nodes[order]
        # distinct (repo, dir, node): adjacent-dedup on the sorted triple
        uniq = np.ones(repos.shape[0], dtype=bool)
        uniq[1:] = (
            (repos[1:] != repos[:-1])
            | (dirs[1:] != dirs[:-1])
            | (nodes[1:] != nodes[:-1])
        )
        repos, dirs, nodes = repos[uniq], dirs[uniq], nodes[uniq]
        new_d = np.ones(repos.shape[0], dtype=bool)
        new_d[1:] = (repos[1:] != repos[:-1]) | (dirs[1:] != dirs[:-1])
        starts = np.flatnonzero(new_d)
        counts = np.diff(np.append(starts, repos.shape[0])).astype(np.int64)
        xors = np.bitwise_xor.reduceat(nodes, starts)
        return _groups_from_summary(
            xors, counts, repos[starts], dirs[starts], min_group
        )

    distinct = (
        hashed.groupby(["repo", "dir", "node"])
        .count()
        .select_columns(["repo", "dir", "node"])
        .materialize()
    )

    # --- distributed per-dir reduction: bucketed vectorized cogroup ---
    from europa_ray.util import hash_strings

    def add_bucket(batch: pa.Table) -> pa.Table:
        # "\x1f" separator: pandas' string hash truncates at NUL, which
        # would bucket every dir of a repo together (skew, not wrongness —
        # reduce_bucket re-groups by (repo, dir) inside the bucket)
        key = [
            f"{r}\x1f{d}"
            for r, d in zip(batch["repo"].to_pylist(), batch["dir"].to_pylist())
        ]
        bk = (hash_strings(key) % np.uint64(nparts * 8)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bk, pa.int64()))

    def reduce_bucket(g: pa.Table) -> pa.Table:
        repos = np.asarray(g["repo"].to_pylist(), dtype=object)
        dirs = np.asarray(g["dir"].to_pylist(), dtype=object)
        nodes = g["node"].to_numpy()
        order = np.lexsort((dirs, repos))
        repos, dirs, nodes = repos[order], dirs[order], nodes[order]
        new_d = np.ones(repos.shape[0], dtype=bool)
        new_d[1:] = (repos[1:] != repos[:-1]) | (dirs[1:] != dirs[:-1])
        starts = np.flatnonzero(new_d)
        counts = np.diff(np.append(starts, repos.shape[0])).astype(np.int64)
        xors = np.bitwise_xor.reduceat(nodes, starts)
        return pa.table(
            {
                "repo": pa.array(repos[starts], pa.string()),
                "dir": pa.array(dirs[starts], pa.string()),
                "xor": pa.array(xors, pa.int64()),
                "n_files": pa.array(counts, pa.int64()),
            }
        )

    summary = (
        distinct.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )
    # the summary is directory-count-sized (≪ corpus): gather for the
    # final (xor, n_files) grouping
    xp: list[np.ndarray] = []
    cp: list[np.ndarray] = []
    rp: list[np.ndarray] = []
    dp: list[np.ndarray] = []
    for b in summary.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        xp.append(b["xor"].to_numpy())
        cp.append(b["n_files"].to_numpy())
        rp.append(np.asarray(b["repo"].to_pylist(), dtype=object))
        dp.append(np.asarray(b["dir"].to_pylist(), dtype=object))
    if not xp:
        return GROUPS_SCHEMA.empty_table()
    return _groups_from_summary(
        np.concatenate(xp),
        np.concatenate(cp).astype(np.int64),
        np.concatenate(rp),
        np.concatenate(dp),
        min_group,
    )
