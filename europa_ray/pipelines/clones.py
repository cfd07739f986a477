"""Type-2 (parameterized) clone detection — the consistent-rename dedup tier.

Code-clone taxonomy (Roy & Cordy 2007, "A Survey on Software Clone Detection
Research") splits duplicate code into Type-1 (byte/format-exact — the exact
and normalization tiers in :mod:`europa_ray.pipelines.exact` /
:mod:`~europa_ray.pipelines.normdedup`), Type-2 (identical up to a CONSISTENT
renaming of identifiers/literals) and Type-3 (near-miss — the MinHash
flagship). This module fills the Type-2 slot with Baker's parameterized
matching (Brenda Baker, "A Program for Identifying Duplicated Code",
Computing Science and Statistics 1993; the p-suffix / P-string construction):
replace every token by ``t<r>`` where ``r`` is the rank of the token's FIRST
occurrence within the document. Two documents map to the same canonical
P-string iff one is a bijective token renaming of the other, so grouping by
the P-string digest finds all consistent-rename clones in one digest-only
groupby — same group-by-digest semantics as the reference's exact pass
(``/root/reference/Api/Implementations/DuplicatesByHash/DuplicateByHashFinder.cs:29-77``)
applied to the parameterized view.

Canonicalization = the normalization-tier chain (comment strip → lowercase →
whitespace collapse → trim; RE2 kernels shared verbatim with the DuckDB
oracle, see :mod:`~europa_ray.pipelines.normdedup`) followed by the
first-occurrence-rank rewrite. Every step is vectorized across the whole
batch (one Arrow ``split_pattern``, one ``dictionary_encode``, one
``np.unique`` + ``lexsort``, one ``binary_join``) — no per-row Python.

Scale shape: the canonicalize+hash stage is one zero-copy ``map_batches``
pass (content never survives it); downstream reuses
:func:`europa_ray.pipelines.exact.exact_dup_clusters` — digest-only shuffle,
size-dispatched driver/distributed grouping. At 100 TB the shuffle carries
~100 B/row exactly like the exact and norm tiers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.pipelines.normdedup import normalize_code_arrow


def param_canonical_arrow(col) -> pa.Array:
    """Parameterized canonical form (P-string) of a string column.

    ``normalize_code_arrow`` first, then each whitespace-token becomes
    ``t<r>`` with ``r`` = 0-based rank of the token's first occurrence in
    its document. Rows whose normalized form is empty canonicalize to ``""``
    (callers drop them; the SQL oracle applies the same predicate).

    Entirely vectorized: token ranks for ALL documents in the batch are
    computed in one ``np.unique`` over ``doc_idx * n_vocab + token_code``
    composite keys plus one lexsort — the only Python loop is over the
    largest per-document rank (≤ max distinct tokens in one doc) to build
    the ``t<r>`` lookup table.
    """
    return param_canonical_from_norm(normalize_code_arrow(col))


def param_canonical_from_norm(norm) -> pa.Array:
    """The first-occurrence-rank rewrite over an ALREADY-normalized column
    (``normalize_code_arrow`` output) — lets a fused digest stage share one
    normalization pass between the norm and Type-2 tiers."""
    return param_canonical_stats(norm)[0]


def param_canonical_stats(norm) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """``(canon, n_tokens, n_distinct)`` for an already-normalized column —
    the P-string plus the per-doc token and distinct-token counts, computed
    in the same vectorized pass. The counts feed the tiered-dedup
    eligibility guard: an all-distinct-token document's P-string is
    ``t0 t1 … tn-1`` — a pure token-count class, not structural evidence —
    so the DESTRUCTIVE ``with_type2`` tier only groups docs with at least
    one repeated token and enough tokens (``n_distinct < n_tokens``);
    the reporting operator :func:`type2_clone_members` stays unguarded."""
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    # large_string → large_list offsets (int64): immune to the int32 offset
    # overflow the span rewrite had to guard against (pipelines/dupspans.py).
    norm = pc.cast(norm, pa.large_string())
    norm = pc.fill_null(norm, "")
    n_docs = len(norm)
    if n_docs == 0:
        empty = np.empty(0, np.int64)
        return pa.array([], pa.large_string()), empty, empty
    lst = pc.split_pattern(norm, " ")
    flat = lst.flatten()  # exactly values[offsets[0]:offsets[-1]], alignment-safe
    offs = lst.offsets.to_numpy()
    offs = offs - offs[0]
    counts = np.diff(offs)
    # an empty normalized doc splits to [''] — count it as 0 tokens
    nonempty = pc.greater(pc.utf8_length(norm), 0).to_numpy(zero_copy_only=False)
    n_tokens = np.where(nonempty, counts, 0)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy().astype(np.int64)
    n_vocab = len(enc.dictionary)
    if n_vocab == 0:
        return pc.cast(norm, pa.large_string()), n_tokens, n_tokens.copy()
    key = doc_idx * np.int64(n_vocab) + codes

    uniq, first_pos, inv = np.unique(key, return_index=True, return_inverse=True)
    doc_of = uniq // np.int64(n_vocab)
    order = np.lexsort((first_pos, doc_of))
    doc_sorted = doc_of[order]
    starts = np.flatnonzero(np.r_[True, doc_sorted[1:] != doc_sorted[:-1]])
    grp_len = np.diff(np.r_[starts, len(order)])
    grouped_rank = np.arange(len(order), dtype=np.int64) - np.repeat(starts, grp_len)
    rank_of = np.empty(len(uniq), dtype=np.int64)
    rank_of[order] = grouped_rank
    tok_rank = rank_of[inv]

    n_distinct = np.zeros(n_docs, dtype=np.int64)
    n_distinct[doc_sorted[starts]] = grp_len
    n_distinct = np.where(nonempty, n_distinct, 0)

    max_r = int(tok_rank.max()) if len(tok_rank) else 0
    lut = np.array([f"t{i}" for i in range(max_r + 1)], dtype=object)
    tok_strs = pa.array(lut[tok_rank], type=pa.large_string())
    out_lst = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), tok_strs)
    canon = pc.binary_join(out_lst, pa.scalar(" ", pa.large_string()))
    # empty normalized docs split to [''] → P-string 't0'; restore ''
    canon = pc.if_else(
        pc.equal(pc.utf8_length(norm), 0),
        pa.scalar("", pa.large_string()),
        canon,
    )
    return canon, n_tokens, n_distinct


def param_canonical_content(batch: pa.Table, *, content_col: str = "content") -> pa.Table:
    """``map_batches`` stage: rewrite ``content_col`` to its parameterized
    canonical form, dropping rows that normalize to empty (all-comment /
    all-whitespace files carry no rename-clone signal; the SQL oracle
    applies the same ``length(n) > 0`` predicate)."""
    canon = pc.cast(param_canonical_arrow(batch[content_col]), pa.string())
    idx = batch.column_names.index(content_col)
    out = batch.set_column(idx, content_col, canon)
    return out.filter(pc.greater(pc.utf8_length(canon), 0))


def type2_clone_members(
    files: ray.data.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cluster table of Type-2 (consistent-rename) duplicates.

    Columns: ``id_cols`` + ``p_sha256`` (digest of the parameterized
    canonical form, = cluster id) + ``n_members``. Supersets the
    normalization tier by construction (the P-string is a function of the
    normalized content).
    """
    from europa_ray.pipelines.exact import exact_dup_clusters

    canoned = files.map_batches(param_canonical_content, batch_format="pyarrow")
    out = exact_dup_clusters(
        canoned, cfg, id_cols=id_cols, num_partitions=num_partitions
    )
    return out.select_columns([*id_cols, "sha256", "n_members"]).rename_columns(
        {"sha256": "p_sha256"}
    )
