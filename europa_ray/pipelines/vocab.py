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


def fold_partial_counts(
    partial: ray.data.Dataset,
    key_col: str,
    n_col: str = "n",
    *,
    gather_max_rows: int = 50_000_000,
) -> ray.data.Dataset:
    """Generic size-dispatched fold of a per-batch partial-count Dataset
    ``(key_col, n_col)`` into global counts (round-5 profile: Ray's
    distributed sort-aggregate costs ~20 s at ~1M output groups where
    arrow's C++ group_by folds the identical partials in ~0.5 s): below
    the row budget, one driver gather + arrow group_by; above it, the
    distributed groupby stands (true web scale)."""
    parts: list[pa.Table] = []
    total = 0
    over = False
    for bt in partial.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += bt.num_rows
        if total > gather_max_rows:
            over = True
            break
        parts.append(bt)
    if over:
        return (
            partial.groupby(key_col)
            .sum(n_col)
            .rename_columns({f"sum({n_col})": n_col})
            .map_batches(
                lambda b: b.set_column(
                    b.column_names.index(n_col), n_col, b[n_col].cast(pa.int64())
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {key_col: pa.array([], pa.string()), n_col: pa.array([], pa.int64())}
            )
        ).materialize()
    folded = pa.concat_tables(parts).group_by(key_col).aggregate([(n_col, "sum")])
    return ray.data.from_arrow(
        pa.table(
            {key_col: folded[key_col], n_col: folded[f"{n_col}_sum"].cast(pa.int64())}
        )
    ).materialize()


def word_count_table(
    files: ray.data.Dataset,
    *,
    text_col: str = "content",
    gather_max_rows: int = 50_000_000,
) -> ray.data.Dataset:
    """(word, n) occurrence-count vocabulary Dataset — per-batch partial
    counts folded by :func:`fold_partial_counts`."""
    partial = files.map_batches(
        _partial_word_counts, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )
    return fold_partial_counts(
        partial, "word", "n", gather_max_rows=gather_max_rows
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
    agg = word_count_table(files, text_col=text_col)
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
    df_gather_max_rows: int = 50_000_000,
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

    partial = files.map_batches(partial_df, batch_format="pyarrow")

    # Size-dispatched driver fast path (house template): the partial table
    # is vocabulary-bounded per block (~20 B/row — Zipf ≪ corpus), and
    # Ray's distributed sort-aggregate is the wrong tool for ~1M output
    # groups (profiled round 5 at bench scale: 20 s for 3.9M partial rows
    # → 1.1M groups, vs ~0.5 s for the same fold in-process via arrow's
    # C++ group_by; int64-keyed and Min-carrying variants measured SLOWER,
    # 13.5 s / 22.5 s). Below the row budget: one driver gather + arrow
    # group_by + the same top-k kernel. Above it (true web scale), the
    # distributed groupby stands unchanged.
    parts: list[pa.Table] = []
    total = 0
    over = False
    for bt in partial.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += bt.num_rows
        if total > df_gather_max_rows:
            over = True
            break
        parts.append(bt)
    if not over:
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return ray.data.from_arrow(STOPWORDS_SCHEMA.empty_table())
        t = pa.concat_tables(parts)
        g = t.group_by(["lang", "word"]).aggregate([("df", "sum")])
        gl, gw, gc, gr = _partial_topk(
            np.asarray(g["lang"].to_pylist(), dtype=object),
            np.asarray(g["word"].to_pylist(), dtype=object),
            g["df_sum"].to_numpy().astype(np.int64),
            k,
        )
        out = pa.table(
            {
                "lang": pa.array(gl.tolist(), pa.string()),
                "rank": pa.array(gr),
                "word": pa.array(gw.tolist(), pa.string()),
                "df": pa.array(gc),
            }
        )
        order = pc.sort_indices(
            out, sort_keys=[("lang", "ascending"), ("rank", "ascending")]
        )
        return ray.data.from_arrow(out.take(order))

    agg = partial.groupby(["lang", "word"]).sum("df")

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
