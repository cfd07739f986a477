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


STOPWORDS_SCHEMA = pa.schema(
    [
        pa.field("lang", pa.string()),
        pa.field("rank", pa.int64()),
        pa.field("word", pa.string()),
        pa.field("df", pa.int64()),
    ]
)


def stopwords_per_lang(
    files: ray.data.Dataset,
    *,
    k: int = 20,
    text_col: str = "content",
    lang_col: str = "lang",
) -> ray.data.Dataset:
    """Per-language stopword extraction: the ``k`` words with the highest
    DOCUMENT frequency in each language (ties → lexicographic), the
    data-driven stopword lists quality scoring and language ID consume
    (stopword ratio is a Gopher/C4 quality signal, and df-ranked function
    words are the classic lexicon seed).

    df counts documents containing the word (presence, not occurrences),
    so a doc repeating a word adds 1 — the standard definition.

    Scale shape: docs never span input batches, so per-batch distinct
    (doc, lang, word) → in-batch (lang, word) partial df is exact; one
    vocabulary-sized ``groupby(lang, word).sum`` shuffle; then the
    :mod:`~europa_ray.pipelines.topk` combiner pair (per-batch partial
    top-k per lang → per-lang final) — the exchange carries
    ``k × langs × blocks`` rows, never the vocabulary.

    Output: ``(lang, rank, word, df)``, rank 1-based.
    """
    import numpy as np

    from europa_ray.pipelines.topk import _partial_topk

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partial_df(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
        sub = batch.filter(valid)
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "word": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
        if sub.num_rows == 0:
            return empty
        scol = sub[text_col]
        if isinstance(scol, pa.ChunkedArray):
            scol = scol.combine_chunks()
        split = pc.split_pattern(scol, " ")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        row_of = np.repeat(np.arange(sub.num_rows, dtype=np.int64), lens)
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not mask.any():
            return empty
        langs = sub[lang_col].cast(pa.string())
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        t = pa.table(
            {
                "row": pa.array(row_of[mask]),
                "lang": langs.take(pa.array(row_of[mask], pa.int64())),
                "word": flat.filter(pa.array(mask)),
            }
        )
        # distinct (doc, word) then count docs per (lang, word) — presence
        dw = t.group_by(["row", "lang", "word"]).aggregate([([], "count_all")])
        g = dw.group_by(["lang", "word"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "word": g["word"],
                "df": g["count_all"].cast(pa.int64()),
            }
        )

    agg = (
        files.map_batches(partial_df, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .sum("df")
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "lang" not in batch.column_names:
            return STOPWORDS_SCHEMA.empty_table()
        g, w, c, r = _partial_topk(
            np.asarray(batch["lang"].to_pylist(), dtype=object),
            np.asarray(batch["word"].to_pylist(), dtype=object),
            batch["sum(df)"].to_numpy().astype(np.int64),
            k,
        )
        return pa.table(
            {
                "lang": pa.array(g.tolist(), pa.string()),
                "rank": pa.array(r),
                "word": pa.array(w.tolist(), pa.string()),
                "df": pa.array(c),
            }
        )

    def final_top(group: pa.Table) -> pa.Table:
        g, w, c, r = _partial_topk(
            np.asarray(group["lang"].to_pylist(), dtype=object),
            np.asarray(group["word"].to_pylist(), dtype=object),
            group["df"].to_numpy().astype(np.int64),
            k,
        )
        return pa.table(
            {
                "lang": pa.array(g.tolist(), pa.string()),
                "rank": pa.array(r),
                "word": pa.array(w.tolist(), pa.string()),
                "df": pa.array(c),
            }
        )

    return (
        agg.map_batches(partial_top, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final_top, batch_format="pyarrow")
    )
