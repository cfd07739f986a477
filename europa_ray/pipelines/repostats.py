"""Per-repository corpus rollup — the repo-level audit row a code-corpus
curator reads first: how big is each repo (characters), how many languages, and how much
of it is duplicated elsewhere.

Output per repo: ``(repo, n_files, n_chars, n_langs, n_dup_files)`` where
``n_dup_files`` counts the repo's nonempty files whose content digest
occurs more than once CORPUS-WIDE (within the repo or in another repo) —
The Stack's repo-level dedup accounting (Kocetkov et al. 2022 §3.2 reports
exactly this per-repo duplicate mass).

100-TB shape: one content scan emits per-batch combined rows of two kinds
over one schema — digest partials ``(repo, sha, c, bytes)`` and distinct
``(repo, lang)`` pairs — so the shuffle carries distinct-(repo, sha) volume
(~90 B/row), never content. The dup decision needs corpus-wide digest
totals, one digest-keyed aggregate + join (the dup_rate_by_lang shape);
lang counts are a repo-cardinality aggregate. Size-dispatched: driver
``np`` path under ``driver_max_rows`` gathered rows, the groupby/join
fallback above it (forced-budget-0 equivalence-tested).

Reference parity: the reference reports per-directory duplicate statistics
after grouping (``/root/reference/Api/Implementations/DuplicatesByHash/
DuplicateByHashFinder.cs:29-77`` grouping + the result summaries the UI
renders); this is that summary at repository granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from europa_ray.util import (
    default_num_partitions,
    scrub_empty_blocks,
    sha256_hex_arrow,
)

REPO_STATS_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("n_files", pa.int64()),
        pa.field("n_chars", pa.int64()),
        pa.field("n_langs", pa.int64()),
        pa.field("n_dup_files", pa.int64()),
    ]
)

# kind 0: digest partial (key = sha, c = files, bytes = chars)
# kind 1: distinct (repo, lang) marker (key = lang, c = bytes = 0)
_ROWS_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.int8()),
        pa.field("repo", pa.string()),
        pa.field("key", pa.string()),
        pa.field("c", pa.int64()),
        pa.field("bytes", pa.int64()),
    ]
)


def _explode_repo_rows(
    batch: pa.Table, *, repo_col: str, lang_col: str, text_col: str
) -> pa.Table:
    """Per-batch combined rows: (repo, sha) digest partials with file and
    char sums, plus distinct (repo, lang) markers; null/empty content rows
    excluded (house predicate)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    col = col.filter(valid)
    if len(col) == 0:
        return _ROWS_SCHEMA.empty_table()
    repos = np.asarray(batch[repo_col].filter(valid).to_pylist(), dtype=object)
    langs = np.asarray(batch[lang_col].filter(valid).to_pylist(), dtype=object)
    chars = pc.utf8_length(col).cast(pa.int64()).to_numpy()
    shas = np.asarray(sha256_hex_arrow(col), dtype="S64")

    rcodes_all, rcode = np.unique(repos, return_inverse=True)
    scodes_all, scode = np.unique(shas, return_inverse=True)
    key = rcode.astype(np.int64) * scodes_all.shape[0] + scode
    order = np.argsort(key, kind="stable")
    k, ch = key[order], chars[order]
    new = np.ones(k.shape[0], dtype=bool)
    new[1:] = k[1:] != k[:-1]
    starts = np.nonzero(new)[0]
    gk = k[starts]
    c = np.diff(np.concatenate([starts, [k.shape[0]]])).astype(np.int64)
    byt = np.add.reduceat(ch, starts).astype(np.int64)

    lcodes_all, lcode = np.unique(langs, return_inverse=True)
    lkey = np.unique(rcode.astype(np.int64) * lcodes_all.shape[0] + lcode)

    n0, n1 = gk.shape[0], lkey.shape[0]
    return pa.table(
        {
            "kind": pa.array(
                np.concatenate([np.zeros(n0, np.int8), np.ones(n1, np.int8)])
            ),
            "repo": pa.array(
                np.concatenate(
                    [
                        rcodes_all[gk // scodes_all.shape[0]],
                        rcodes_all[lkey // lcodes_all.shape[0]],
                    ]
                ),
                pa.string(),
            ),
            "key": pa.array(
                np.concatenate(
                    [
                        scodes_all[gk % scodes_all.shape[0]].astype("U64"),
                        lcodes_all[lkey % lcodes_all.shape[0]],
                    ]
                ).astype(object),
                pa.string(),
            ),
            "c": pa.array(
                np.concatenate([c, np.zeros(n1, np.int64)]), pa.int64()
            ),
            "bytes": pa.array(
                np.concatenate([byt, np.zeros(n1, np.int64)]), pa.int64()
            ),
        }
    )


def _repo_stats_table(
    kind: np.ndarray,
    repos: np.ndarray,
    keys: np.ndarray,
    cs: np.ndarray,
    bys: np.ndarray,
) -> pa.Table:
    """Driver-path rollup over gathered rows (cross-batch repeats of both
    row kinds are combined here)."""
    if repos.shape[0] == 0:
        return REPO_STATS_SCHEMA.empty_table()
    rcodes_all, rcode = np.unique(repos, return_inverse=True)
    n_repos = rcodes_all.shape[0]
    dig = kind == 0

    # digest side: combine (repo, sha) partials, corpus totals per sha
    rd, kd, cd, bd = rcode[dig], keys[dig], cs[dig], bys[dig]
    n_files = np.zeros(n_repos, np.int64)
    n_chars = np.zeros(n_repos, np.int64)
    n_dup = np.zeros(n_repos, np.int64)
    if rd.shape[0]:
        scodes_all, scode = np.unique(kd, return_inverse=True)
        pkey = rd.astype(np.int64) * scodes_all.shape[0] + scode
        order = np.argsort(pkey, kind="stable")
        pk, pc_, pb = pkey[order], cd[order], bd[order]
        new = np.ones(pk.shape[0], dtype=bool)
        new[1:] = pk[1:] != pk[:-1]
        starts = np.nonzero(new)[0]
        gk = pk[starts]
        gc = np.add.reduceat(pc_, starts)
        gb = np.add.reduceat(pb, starts)
        gr, gs = gk // scodes_all.shape[0], gk % scodes_all.shape[0]
        total = np.zeros(scodes_all.shape[0], np.int64)
        np.add.at(total, gs, gc)
        dupm = total[gs] > 1
        np.add.at(n_files, gr, gc)
        np.add.at(n_chars, gr, gb)
        np.add.at(n_dup, gr[dupm], gc[dupm])

    # lang side: distinct (repo, lang) pairs
    rl, kl = rcode[~dig], keys[~dig]
    n_langs = np.zeros(n_repos, np.int64)
    if rl.shape[0]:
        lcodes_all, lcode = np.unique(kl, return_inverse=True)
        lu = np.unique(rl.astype(np.int64) * lcodes_all.shape[0] + lcode)
        np.add.at(n_langs, lu // lcodes_all.shape[0], 1)

    return pa.table(
        {
            "repo": pa.array(rcodes_all, pa.string()),
            "n_files": pa.array(n_files, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_langs": pa.array(n_langs, pa.int64()),
            "n_dup_files": pa.array(n_dup, pa.int64()),
        }
    )  # np.unique → repo-sorted


def repo_stats(
    files: ray.data.Dataset,
    *,
    repo_col: str = "repo",
    lang_col: str = "lang",
    text_col: str = "content",
    driver_max_rows: int = 50_000_000,
    num_partitions: int | None = None,
):
    """Per-repo rollup: (repo, n_files, n_chars, n_langs, n_dup_files),
    repo-sorted. ``n_dup_files`` counts files whose digest occurs >1 time
    corpus-wide."""
    if num_partitions is None:
        num_partitions = default_num_partitions()
    rows = files.map_batches(
        _explode_repo_rows,
        fn_kwargs={"repo_col": repo_col, "lang_col": lang_col, "text_col": text_col},
        batch_format="pyarrow",
    )

    # --- driver fast path ---
    parts: list[pa.Table] = []
    total = 0
    for b in rows.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += b.num_rows
        if total > driver_max_rows:
            parts = []
            break
        if b.num_rows:
            parts.append(b)
    else:
        if not parts:
            return REPO_STATS_SCHEMA.empty_table()
        t = pa.concat_tables(parts)
        return _repo_stats_table(
            t["kind"].to_numpy(),
            np.asarray(t["repo"].to_pylist(), dtype=object),
            np.asarray(t["key"].to_pylist(), dtype=object),
            t["c"].to_numpy(),
            t["bytes"].to_numpy(),
        )

    # --- distributed fallback ---
    rows = rows.materialize()  # two consumers: digest side + lang side
    dig = rows.filter(expr="kind == 0")
    grouped = (
        dig.groupby(["key", "repo"])
        .sum(["c", "bytes"])
        .rename_columns({"sum(c)": "c", "sum(bytes)": "bytes"})
        .materialize()
    )
    # hash-shuffle groupby outputs can carry Ray 2.49 zero-column empty
    # blocks (mostly-empty partitions on tiny corpora) that poison the
    # join below even on its LEFT side — scrub first
    grouped = scrub_empty_blocks(
        grouped,
        pa.schema(
            [
                pa.field("key", pa.string()),
                pa.field("repo", pa.string()),
                pa.field("c", pa.int64()),
                pa.field("bytes", pa.int64()),
            ]
        ),
    )
    totals = (
        grouped.groupby("key")
        .sum("c")
        .map_batches(
            lambda b: pa.table(
                {"__k": b["key"], "total": b["sum(c)"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    totals = scrub_empty_blocks(
        totals,
        pa.schema([pa.field("__k", pa.string()), pa.field("total", pa.int64())]),
    )
    joined = grouped.join(
        totals,
        join_type="inner",
        num_partitions=num_partitions,
        on=("key",),
        right_on=("__k",),
    )

    def digest_partial(b: pa.Table) -> pa.Table:
        c = b["c"].cast(pa.int64()).to_numpy()
        byt = b["bytes"].cast(pa.int64()).to_numpy()
        tot = b["total"].cast(pa.int64()).to_numpy()
        repos = np.asarray(b["repo"].to_pylist(), dtype=object)
        rcodes_all, rcode = np.unique(repos, return_inverse=True)
        n = rcodes_all.shape[0]
        nf = np.zeros(n, np.int64)
        nb = np.zeros(n, np.int64)
        nd = np.zeros(n, np.int64)
        dupm = tot > 1
        np.add.at(nf, rcode, c)
        np.add.at(nb, rcode, byt)
        np.add.at(nd, rcode[dupm], c[dupm])
        return pa.table(
            {
                "repo": pa.array(rcodes_all, pa.string()),
                "n_files": pa.array(nf, pa.int64()),
                "n_chars": pa.array(nb, pa.int64()),
                "n_dup_files": pa.array(nd, pa.int64()),
            }
        )

    digest_side = (
        joined.map_batches(digest_partial, batch_format="pyarrow")
        .groupby("repo")
        .sum(["n_files", "n_chars", "n_dup_files"])
        .rename_columns(
            {
                "sum(n_files)": "n_files",
                "sum(n_chars)": "n_chars",
                "sum(n_dup_files)": "n_dup_files",
            }
        )
        .materialize()
    )
    # digest_side descends from a join: Ray 2.49 joins emit zero-column
    # empty blocks that map_batches passes through UNCALLED and that poison
    # the NEXT join ("no match ... on left side") — scrub before joining
    digest_side = scrub_empty_blocks(
        digest_side,
        pa.schema(
            [
                pa.field("repo", pa.string()),
                pa.field("n_files", pa.int64()),
                pa.field("n_chars", pa.int64()),
                pa.field("n_dup_files", pa.int64()),
            ]
        ),
    )

    lang_side = (
        rows.filter(expr="kind == 1")
        .groupby(["repo", "key"])
        .count()
        .groupby("repo")
        .count()
        .rename_columns({"count()": "n_langs"})
        .map_batches(
            lambda b: pa.table(
                {"__r": b["repo"], "n_langs": b["n_langs"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    lang_side = scrub_empty_blocks(
        lang_side,
        pa.schema([pa.field("__r", pa.string()), pa.field("n_langs", pa.int64())]),
    )
    final = digest_side.join(
        lang_side,
        join_type="inner",  # every repo with files has ≥1 lang row
        num_partitions=num_partitions,
        on=("repo",),
        right_on=("__r",),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": b["repo"],
                "n_files": b["n_files"].cast(pa.int64()),
                "n_chars": b["n_chars"].cast(pa.int64()),
                "n_langs": b["n_langs"].cast(pa.int64()),
                "n_dup_files": b["n_dup_files"].cast(pa.int64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow").sort("repo")
