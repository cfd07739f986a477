"""Normalization-tier exact dedup — the "near-exact" code-dedup tier.

Large code-corpus pipelines (The Stack / BigCode, CodeParrot) run an extra
dedup tier between byte-exact and MinHash: normalize away formatting-only
variation (comments, whitespace runs, letter case), hash the NORMALIZED
content, and group — catching reformatted/vendored copies that byte-exact
dedup misses at a fraction of MinHash's cost. Reference parity: this is the
same group-by-digest semantics as the exact pass
(``/root/reference/Api/Implementations/DuplicatesByHash/DuplicateByHashFinder.cs:29-77``)
applied to a canonicalized view of the content.

The normalization is deliberately restricted to kernels with IDENTICAL
semantics in pyarrow.compute (RE2) and DuckDB (RE2), so the operator is
value-checkable against a pure-SQL oracle:

1. strip ``//``- and ``#``-to-end-of-line comments (``(//|#)[^\n]*`` → ``""``)
2. lowercase
3. collapse ``[ \t\r\n]+`` runs to a single space
4. trim leading/trailing spaces

Scale shape: the normalize+hash stage is one zero-copy ``map_batches`` pass
(content never survives it), and everything downstream reuses
:func:`europa_ray.pipelines.exact.exact_dup_clusters` — digest-only shuffle,
size-dispatched driver/distributed grouping.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.util import sha256_hex_arrow

#: RE2 patterns shared verbatim (modulo SQL string-literal encoding) with the
#: DuckDB oracle in ``__ray_entry__.oracle_sql()``.
COMMENT_RE = "(//|#)[^\n]*"
WS_RE = "[ \t\r\n]+"


def normalize_code_arrow(col):
    """Canonical formatting-insensitive view of a string column.

    Comment strip → lowercase → whitespace collapse → trim; every step is a
    vectorized Arrow kernel (RE2 regex, no Python per row).
    """
    s = pc.replace_substring_regex(col, pattern=COMMENT_RE, replacement="")
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, pattern=WS_RE, replacement=" ")
    return pc.utf8_trim(s, characters=" ")


def normalize_content(batch: pa.Table) -> pa.Table:
    """``map_batches`` stage: rewrite ``content`` to its normalized form and
    drop rows that normalize to empty (all-comment / all-whitespace files
    carry no dedupable signal; the SQL oracle applies the same predicate)."""
    norm = normalize_code_arrow(batch["content"])
    idx = batch.column_names.index("content")
    out = batch.set_column(idx, "content", norm)
    return out.filter(pc.greater(pc.utf8_length(norm), 0))


def norm_dup_members(
    files: ray.data.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cluster table of normalization-equivalent duplicates.

    Columns: ``id_cols`` + ``norm_sha256`` (digest of the NORMALIZED
    content, = cluster id) + ``n_members``. Supersets byte-exact duplicates
    by construction (normalization is a function).
    """
    from europa_ray.pipelines.exact import exact_dup_clusters

    normed = files.map_batches(normalize_content, batch_format="pyarrow")
    out = exact_dup_clusters(
        normed, cfg, id_cols=id_cols, num_partitions=num_partitions
    )
    return out.select_columns([*id_cols, "sha256", "n_members"]).rename_columns(
        {"sha256": "norm_sha256"}
    )


def _add_both_digests(
    batch: pa.Table,
    *,
    id_col: str,
    with_len: bool = False,
    with_param: bool = False,
    t2_min_tokens: int = 0,
) -> pa.Table:
    """One content pass → (id, sha256, norm_sha256[, p_sha256][, nbytes]);
    content dropped before any shuffle. Empty raw content is dropped (every
    tier's predicate). ``with_len`` adds the raw content byte length (the
    keep-longest representative rule's ordering key); ``with_param`` adds
    the Type-2 parameterized-canonical digest
    (:func:`europa_ray.pipelines.clones.param_canonical_arrow`).
    ``t2_min_tokens > 0`` gates P-digest eligibility: only docs with at
    least that many tokens AND at least one REPEATED token group (an
    all-distinct-token P-string is a pure token-count class — grouping on
    it would merge unrelated short docs); ineligible docs keep their NORM
    identity."""
    mask = pc.greater(pc.utf8_length(batch["content"]), 0)
    batch = batch.filter(mask)
    raw_sha = pa.array(sha256_hex_arrow(batch["content"]), pa.string())
    norm = normalize_code_arrow(batch["content"])
    # A doc that normalizes to empty (all comments / all whitespace) keeps
    # its raw identity in the norm tier — the tier never merges contentless
    # docs. Mirrored by the CASE in the dedup_tiers oracle SQL.
    norm_sha = pc.if_else(
        pc.greater(pc.utf8_length(norm), 0),
        pa.array(sha256_hex_arrow(norm), pa.string()),
        raw_sha,
    )
    cols = {
        id_col: batch[id_col],
        "sha256": raw_sha,
        "norm_sha256": norm_sha,
    }
    if with_param:
        import numpy as np

        from europa_ray.pipelines.clones import param_canonical_stats

        canon, ntok, ndist = param_canonical_stats(norm)
        canon = pc.cast(canon, pa.string())
        # eligibility: non-empty canonical form, and past the guard a
        # minimum token count plus at least one repeated token (mirrored
        # by the oracle's clists predicate + LEFT JOIN/COALESCE fallback);
        # ineligible docs keep their NORM identity in the Type-2 tier
        ok = ntok > 0
        if t2_min_tokens > 0:
            ok &= (ntok >= t2_min_tokens) & (ndist < ntok)
        cols["p_sha256"] = pc.if_else(
            pa.array(ok),
            pa.array(sha256_hex_arrow(canon), pa.string()),
            norm_sha,
        )
    if with_len:
        cols["nbytes"] = pc.cast(pc.binary_length(batch["content"]), pa.int64())
    return pa.table(cols)


def dedup_tiers(
    files: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> pa.Table:
    """One-row tier report: how much each dedup tier removes.

    Columns: ``n_rows``, ``n_exact_distinct``, ``n_norm_distinct``,
    ``exact_dup_rows`` (rows a byte-exact keep-first pass drops) and
    ``norm_extra_dup_rows`` (ADDITIONAL rows the normalization tier drops on
    the already-exact-deduped corpus). Both digests come from a single
    content pass; the distinct counts are digest-only aggregations (the
    content never enters a shuffle), so at 100 TB this costs two digest
    groupbys over ~100 B/row tables.
    """
    hashed = files.map_batches(
        _add_both_digests, fn_kwargs={"id_col": id_col}, batch_format="pyarrow"
    ).materialize()
    n_rows = hashed.count()
    if n_rows == 0:
        return pa.table(
            {
                "n_rows": pa.array([0], pa.int64()),
                "n_exact_distinct": pa.array([0], pa.int64()),
                "n_norm_distinct": pa.array([0], pa.int64()),
                "exact_dup_rows": pa.array([0], pa.int64()),
                "norm_extra_dup_rows": pa.array([0], pa.int64()),
            }
        )
    n_exact = hashed.groupby("sha256").count().count()
    n_norm = hashed.groupby("norm_sha256").count().count()
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_exact_distinct": pa.array([n_exact], pa.int64()),
            "n_norm_distinct": pa.array([n_norm], pa.int64()),
            "exact_dup_rows": pa.array([n_rows - n_exact], pa.int64()),
            "norm_extra_dup_rows": pa.array([n_exact - n_norm], pa.int64()),
        }
    )
