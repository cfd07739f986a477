"""Commit-aware version dedup — keep the newest version of every
``(repo, path)`` file. A source-code corpus crawled across commits carries
many versions of the same file; training pipelines (The Stack: one version
per file, newest revision) collapse them BEFORE content dedup, since stale
versions are near-dups of the head version and would otherwise flood the
expensive similarity tiers.

Semantics: per ``(repo, path)`` group keep the row with the maximum
``commit`` identifier (lexicographic — correct for zero-padded or
fixed-width monotone ids like the corpus's 40-char commits; a caller with
hash commits supplies a sortable revision column instead), ties broken by
max ``doc_id``. Output one row per distinct file:
``(doc_id, repo, path, commit, n_versions)``.

Scale shape: metadata-only — content never leaves the first pass. A
per-batch combiner reduces each batch to one row per distinct
``(repo, path)`` (argmax + count, one lexsort per batch), then ONE
file-cardinality ``groupby(repo, path).aggregate(Max(key), Sum(n))``
shuffle; the argmax travels as a single packed ``commit \\x1f doc_id``
string so the global reduction is a built-in vectorized Max (no
map_groups, no per-group Python). ``\\x1f`` as separator per the house
rule (util.hash_strings: NUL truncates in pandas hashing).

Reference parity: Europa scans a live filesystem (one version per path by
construction — ``DirectoryReader.cs`` enumerates current files only); this
operator supplies the equivalent invariant for commit-versioned corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_SEP = "\x1f"
_ID_WIDTH = 20  # zero-padded int64 doc_id (≤ 19 digits + margin)

VERSIONS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("n_versions", pa.int64()),
    ]
)


def _partial_latest(batch: pa.Table, *, id_col: str) -> pa.Table:
    """Per-batch combiner: one (repo, path, key, n) row per distinct file,
    where key = the batch-local argmax ``commit␟doc_id`` pack — one
    vectorized Arrow ``group_by`` (max + count), no per-row Python. doc_id
    must be non-negative (zero-padding is not order-preserving below 0 —
    the corpus invariant; asserted)."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "repo": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "key": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if pc.min(ids).as_py() < 0:
        raise ValueError("latest_file_versions requires non-negative ids")
    key = pc.binary_join_element_wise(
        batch["commit"],
        pc.utf8_lpad(pc.cast(ids, pa.string()), _ID_WIDTH, "0"),
        _SEP,
    )
    t = pa.table({"repo": batch["repo"], "path": batch["path"], "key": key})
    g = t.group_by(["repo", "path"]).aggregate([("key", "max"), ([], "count_all")])
    return pa.table(
        {
            "repo": g["repo"],
            "path": g["path"],
            "key": g["key_max"],
            "n": g["count_all"].cast(pa.int64()),
        }
    )


def latest_file_versions(
    files: ray.data.Dataset, *, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One row per distinct ``(repo, path)``: the newest version's identity
    plus the version count. See module docstring for the scale shape."""
    from ray.data.aggregate import Max, Sum

    partials = files.map_batches(
        _partial_latest, fn_kwargs={"id_col": id_col}, batch_format="pyarrow"
    )
    agg = partials.groupby(["repo", "path"]).aggregate(Max("key"), Sum("n"))

    def unpack(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "max(key)" not in batch.column_names:
            return VERSIONS_SCHEMA.empty_table()
        split = pc.split_pattern(batch["max(key)"], _SEP)
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        commit = pc.list_element(split, 0)
        doc_id = pc.cast(pc.list_element(split, 1), pa.int64())
        return pa.table(
            {
                "doc_id": doc_id,
                "repo": batch["repo"],
                "path": batch["path"],
                "commit": commit,
                "n_versions": batch["sum(n)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")
