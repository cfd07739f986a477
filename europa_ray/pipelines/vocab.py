"""Corpus-wide vocabulary statistics — the word-count shape: per-batch
partial counts (combiner inside ``map_batches``, so the shuffle moves one
row per DISTINCT word per batch, not one per token), a vocabulary-sized
``groupby().sum()``, and a deterministic tie-safe top-k.

Words are single-space-split segments (the corpus's own delimiter), kept
as STRINGS end-to-end so the DuckDB oracle (``string_split`` + ``GROUP
BY``) verifies value-for-value — unlike the 64-bit token hashes used by
the signature pipelines, which trade the string identity away for speed.

100-TB shape: the partial-count combiner bounds shuffle volume at
(batches × batch vocabulary) rows regardless of token count; the global
aggregate is vocabulary-sized (Zipf: ≪ corpus); top-k is a sort+limit on
that aggregate. No driver gather of anything corpus-sized.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _partial_word_counts(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    split = pc.split_pattern(col, " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = split.flatten()
    flat = flat.filter(pc.not_equal(flat, ""))
    if len(flat) == 0:
        return pa.table(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    vc = pc.value_counts(flat)
    return pa.table(
        {"word": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
    )


def vocab_top_words(
    files: ray.data.Dataset,
    *,
    k: int = 50,
    text_col: str = "content",
) -> ray.data.Dataset:
    """Top-``k`` words by corpus frequency, tie-broken (n DESC, word ASC) —
    the same total order as the oracle's ``ORDER BY n DESC, word LIMIT k``,
    so the cut is deterministic on both sides."""
    partials = files.map_batches(
        _partial_word_counts, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )
    agg = (
        partials.groupby("word")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
        .map_batches(
            lambda b: b.set_column(
                b.column_names.index("n"), "n", b["n"].cast(pa.int64())
            ),
            batch_format="pyarrow",
        )
    )
    return agg.sort(["n", "word"], descending=[True, False]).limit(k)
