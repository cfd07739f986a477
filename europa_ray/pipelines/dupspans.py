"""Duplicated-span statistics — the ExactSubstr corpus-self-dedup measure
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better": remove every span that appears verbatim elsewhere in the corpus,
first occurrence wins). Realized over w-token grams:

- a position p of document d is DUPLICATED when its w-gram occurs at more
  than one (doc, pos) in the corpus and (d, p) is not the globally first
  occurrence (minimum packed ``doc·2^32 + pos`` key — deterministic);
- a document's ``covered_tokens`` is the length of the union of the
  intervals [p, p+w) over its duplicated positions — exactly the token
  mass ExactSubstr dedup would delete from it.

Shape (all stages shuffle gram-hash metadata, never content):

1. gram stream: one ``map_batches`` pass emits (gram_hash, packed key) per
   token position — 16 B/position, the same exchange class as the LSH band
   explode;
2. ``groupby(gram).aggregate(count, min(key))`` — Ray's hash aggregate
   combines map-side, so the shuffle carries one row per distinct gram per
   block; duplicated grams (count > 1) with their first key are the ONLY
   rows that leave the aggregate;
3. the duplicated-gram set is broadcast (sorted arrays + ``ray.put``) and
   the gram stream is RECOMPUTED in a second content pass filtered against
   it (recompute is CPU-cheap; materializing the full position stream
   would cost 16 B/token of object store) — above ``broadcast_max_grams``
   a distributed hash join takes over (forced-budget equivalence test);
4. per-document interval-union coverage: ``groupby(doc).map_groups`` with
   a vectorized body (sort + diff: coverage = Σ min(next−p, w) + w).

Gram identity is the engine's 64-bit shingle hash; the SQL oracle groups
by the gram STRING. The two agree unless two distinct grams collide in 64
bits (P ≈ n²/2^65 — immaterial at any corpus size the oracle can check),
the same accepted identity trick as the n-gram Jaccard oracle's 64-bit
node ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from europa_ray.functions.text import shingles, tokenize_arrow

POS_BASE = np.int64(1) << np.int64(32)  # packed key = doc_id * 2^32 + pos


def _gram_stream(batch: pa.Table, *, id_col: str, w: int) -> pa.Table:
    th, off = tokenize_arrow(batch["content"])
    gh, goff = shingles(th, off, w, short_row_fallback=False)
    ids = batch[id_col].to_numpy()
    n_per = np.diff(goff)
    doc_rep = np.repeat(ids, n_per)
    pos = np.arange(gh.shape[0], dtype=np.int64) - np.repeat(goff[:-1], n_per)
    return pa.table(
        {
            "gram": pa.array(gh.view(np.int64)),
            "key": pa.array(doc_rep * POS_BASE + pos),
        }
    )


def _coverage(group: pa.Table, *, w: int) -> pa.Table:
    doc = group["doc_id"][0].as_py()
    p = np.sort(group["pos"].to_numpy())
    if p.shape[0] == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "dup_positions": pa.array([], pa.int64()),
             "covered_tokens": pa.array([], pa.int64())}
        )
    covered = int(np.minimum(np.diff(p), w).sum()) + w
    return pa.table(
        {
            "doc_id": pa.array([doc], pa.int64()),
            "dup_positions": pa.array([p.shape[0]], pa.int64()),
            "covered_tokens": pa.array([covered], pa.int64()),
        }
    )


def dup_span_stats(
    files: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    w: int = 16,
    broadcast_max_grams: int = 5_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-document duplicated-span statistics (docs with ≥ 1 duplicated
    position): (doc_id, dup_positions, covered_tokens). See module doc."""
    from europa_ray.util import default_num_partitions

    nparts = num_partitions or default_num_partitions()
    stream_kwargs = {"id_col": id_col, "w": w}

    from ray.data.aggregate import Count, Min

    stats = (
        files.map_batches(_gram_stream, fn_kwargs=stream_kwargs, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Count(), Min("key"))
        # Ray expr filters can't reference 'count()': rename, then filter
        .rename_columns({"count()": "n_occ", "min(key)": "first_key"})
        .filter(expr="n_occ > 1")
        .materialize()
    )
    n_dup_grams = stats.count()

    if n_dup_grams == 0:
        schema = pa.schema(
            [pa.field("doc_id", pa.int64()),
             pa.field("dup_positions", pa.int64()),
             pa.field("covered_tokens", pa.int64())]
        )
        return ray.data.from_arrow(schema.empty_table())

    if n_dup_grams <= broadcast_max_grams:
        g_parts, k_parts = [], []
        for b in stats.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            g_parts.append(b["gram"].to_numpy())
            k_parts.append(b["first_key"].to_numpy())
        grams = np.concatenate(g_parts)
        order = np.argsort(grams)
        grams, firsts = grams[order], np.concatenate(k_parts)[order]
        ref = ray.put((grams, firsts))

        def dup_positions(batch: pa.Table) -> pa.Table:
            gs, fs = ray.get(ref)
            t = _gram_stream(batch, **stream_kwargs)
            gv = t["gram"].to_numpy()
            kv = t["key"].to_numpy()
            idx = np.searchsorted(gs, gv)
            idx_c = np.minimum(idx, gs.shape[0] - 1)
            hit = (gs[idx_c] == gv) & (kv != fs[idx_c])
            return pa.table(
                {
                    "doc_id": pa.array(kv[hit] // POS_BASE),
                    "pos": pa.array(kv[hit] % POS_BASE),
                }
            )

        dups = files.map_batches(dup_positions, batch_format="pyarrow")
    else:
        stream = files.map_batches(
            _gram_stream, fn_kwargs=stream_kwargs, batch_format="pyarrow"
        )
        joined = stream.join(
            stats, join_type="inner", num_partitions=nparts, on=("gram",)
        ).filter(expr="key != first_key")

        def unpack(batch: pa.Table) -> pa.Table:
            kv = batch["key"].to_numpy()
            return pa.table(
                {
                    "doc_id": pa.array(kv // POS_BASE),
                    "pos": pa.array(kv % POS_BASE),
                }
            )

        dups = joined.map_batches(unpack, batch_format="pyarrow")

    return dups.groupby("doc_id").map_groups(
        _coverage, fn_kwargs={"w": w}, batch_format="pyarrow"
    )
