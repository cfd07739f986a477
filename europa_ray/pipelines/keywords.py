"""Per-document top-k distinctive terms — tf-idf-style keyword extraction
with an INTEGER-EXACT ranking: within each document, terms are ranked by
``(tf DESC, df ASC, term ASC)`` — highest term frequency first, rarest
corpus-wide (lowest document frequency) on ties, lexicographic last. This
is the tf-idf ordering with the idf monotonicity made exact (idf is a
strictly decreasing function of df, so ranking by df ascending within a tf
tie IS the tf-idf order for tied tf) — no ``log`` on either side, so the
DuckDB oracle (``row_number() OVER``) matches bit-for-bit.

Terms are single-space-split segments kept as STRINGS (the
:mod:`~europa_ray.pipelines.vocab` convention); df counts DOCUMENTS
containing the term (distinct (doc, term)), the classic definition.

Scale shape (the :mod:`~europa_ray.pipelines.lm` two-pass broadcast
pattern):

* pass 1: per-batch ``(doc, term, tf)`` via one vectorized Arrow
  ``group_by`` (docs never span input batches), reduced to the
  vocabulary-sized df table by one ``groupby(term).count()`` shuffle
  (Zipf: ≪ corpus).
* pass 2 (broadcast, df table ≤ ``df_broadcast_max`` rows): the (term, df)
  table is ``ray.put`` once and cached per worker; each batch recomputes
  its in-batch tf, attaches df by ``index_in``, sorts
  ``(doc, −tf, df, term)`` with one Arrow ``sort_by`` and keeps rank ≤ k.
  No doc-keyed shuffle at all — per-doc rows never leave their batch.
* join fallback (forced with ``df_broadcast_max=0``; equivalence-tested):
  tf rows join the df table on term, then one ``groupby(doc).map_groups``
  ranks co-located rows.

Output: ``(doc_id, term, tf, df, rank)``, rank 1-based, ≤ k rows per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

KEYWORDS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("term", pa.string()),
        pa.field("tf", pa.int64()),
        pa.field("df", pa.int64()),
        pa.field("rank", pa.int64()),
    ]
)

_WORKER_DF_CACHE: dict = {}

_SORT_KEYS = [
    ("doc_id", "ascending"),
    ("neg_tf", "ascending"),
    ("df", "ascending"),
    ("term", "ascending"),
]


def _doc_term_tf(batch: pa.Table, *, text_col: str, id_col: str) -> pa.Table:
    """(doc_id, term, tf) for one batch — one vectorized Arrow group_by;
    empty segments (consecutive spaces) filtered like vocab counting."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    sub = batch.filter(valid)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
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
    ids = sub[id_col].cast(pa.int64()).to_numpy()
    t = pa.table(
        {
            "doc_id": pa.array(ids[row_of[mask]]),
            "term": flat.filter(pa.array(mask)),
        }
    )
    g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "doc_id": g["doc_id"],
            "term": g["term"],
            "tf": g["count_all"].cast(pa.int64()),
        }
    )


def _rank_tf_table(t: pa.Table, k: int) -> pa.Table:
    """(doc_id, term, tf, df) rows (any order, all rows of a doc present)
    → top-k ranked rows per doc via one Arrow sort + numpy run walk."""
    if t.num_rows == 0:
        return KEYWORDS_SCHEMA.empty_table()
    t = t.append_column("neg_tf", pc.negate(t["tf"]))
    t = t.sort_by(_SORT_KEYS).drop_columns(["neg_tf"])
    d = t["doc_id"].to_numpy()
    newd = np.ones(d.shape[0], dtype=bool)
    newd[1:] = d[1:] != d[:-1]
    run_start = np.maximum.accumulate(np.where(newd, np.arange(d.shape[0]), 0))
    rank = np.arange(d.shape[0], dtype=np.int64) - run_start + 1
    keep = rank <= k
    return pa.table(
        {
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "term": t["term"].filter(pa.array(keep)),
            "tf": t["tf"].filter(pa.array(keep)),
            "df": t["df"].filter(pa.array(keep)),
            "rank": pa.array(rank[keep]),
        }
    )


def doc_top_terms(
    files: ray.data.Dataset,
    *,
    k: int = 5,
    text_col: str = "content",
    id_col: str = "doc_id",
    df_broadcast_max: int = 30_000_000,
    df_gather_max_rows: int = 50_000_000,
) -> ray.data.Dataset:
    """Top-``k`` distinctive terms per document (module docstring order).
    Dispatch on the df-table size: broadcast (vocabulary-sized, the norm)
    vs term-keyed join + doc-keyed map_groups fallback."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf_kwargs = {"text_col": text_col, "id_col": id_col}

    # df-table build, size-dispatched like vocab.stopwords_per_lang: the
    # per-batch partial (term → count of docs in batch) is vocabulary-
    # bounded, and Ray's distributed sort-aggregate is the wrong tool for
    # ~1M output groups (profiled round 5: the groupby(term).count() was
    # the dominant cost of this pipeline at bench scale) — below the row
    # budget, one driver gather + arrow C++ group_by folds the partials;
    # above it, the distributed groupby stands.
    def _partial_term_counts(batch: pa.Table) -> pa.Table:
        tf = _doc_term_tf(batch, **tf_kwargs)
        if tf.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        col = tf["term"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        return pa.table(
            {"term": vc.field("values"), "c": vc.field("counts").cast(pa.int64())}
        )

    partial = files.map_batches(_partial_term_counts, batch_format="pyarrow")
    parts: list[pa.Table] = []
    total = 0
    over = False
    for bt in partial.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += bt.num_rows
        if total > df_gather_max_rows:
            over = True
            break
        parts.append(bt)
    if over:
        df_agg = (
            partial.groupby("term")
            .sum("c")
            .rename_columns({"sum(c)": "count()"})
            .materialize()
        )
        n_terms = df_agg.count()
    else:
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return ray.data.from_arrow(KEYWORDS_SCHEMA.empty_table())
        folded = (
            pa.concat_tables(parts).group_by("term").aggregate([("c", "sum")])
        )
        df_agg = None
        n_terms = folded.num_rows

    if n_terms <= df_broadcast_max:
        if df_agg is None:
            terms_arr = folded["term"]
            if isinstance(terms_arr, pa.ChunkedArray):
                terms_arr = terms_arr.combine_chunks()
            dfs_arr = folded["c_sum"].to_numpy().astype(np.int64)
        else:
            terms_p: list[pa.Array] = []
            dfs_p: list[np.ndarray] = []
            for b in df_agg.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
                col = b["term"]
                terms_p.extend(
                    col.chunks if isinstance(col, pa.ChunkedArray) else [col]
                )
                dfs_p.append(b["count()"].to_numpy().astype(np.int64))
            if not terms_p:
                return ray.data.from_arrow(KEYWORDS_SCHEMA.empty_table())
            terms_arr = pa.chunked_array(terms_p).combine_chunks()
            dfs_arr = np.concatenate(dfs_p)
        ref = ray.put((terms_arr, dfs_arr))

        def rank_batch(batch: pa.Table) -> pa.Table:
            key = ref.hex()
            model = _WORKER_DF_CACHE.get(key)
            if model is None:
                _WORKER_DF_CACHE.clear()  # one df table live per worker
                model = _WORKER_DF_CACHE[key] = ray.get(ref)
            vterms, vdf = model
            tf = _doc_term_tf(batch, **tf_kwargs)
            if tf.num_rows == 0:
                return KEYWORDS_SCHEMA.empty_table()
            idx = (
                pc.fill_null(pc.index_in(tf["term"], value_set=vterms), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            # every batch term is in the df table by construction (same
            # tokenization produced it) — a miss means pass skew, fail fast
            if (idx < 0).any():
                raise AssertionError("term missing from df table")
            tf = tf.append_column("df", pa.array(vdf[idx]))
            return _rank_tf_table(tf, k)

        return files.map_batches(rank_batch, batch_format="pyarrow")

    # --- join fallback (df table too large to broadcast) ---
    from europa_ray.util import default_num_partitions, scrub_empty_blocks

    nparts = default_num_partitions()
    tf_ds = files.map_batches(
        _doc_term_tf, fn_kwargs=tf_kwargs, batch_format="pyarrow"
    )
    if df_agg is None:  # driver-folded vocab, too big to broadcast: join it
        df_side = ray.data.from_arrow(
            pa.table(
                {"__t": folded["term"], "df": folded["c_sum"].cast(pa.int64())}
            )
        ).materialize()
    else:
        df_side = df_agg.map_batches(
            lambda b: pa.table(
                {"__t": b["term"], "df": b["count()"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()
    joined = tf_ds.join(
        df_side,
        join_type="inner",
        num_partitions=nparts,
        on=("term",),
        right_on=("__t",),
    )
    joined = scrub_empty_blocks(
        joined.materialize(),
        pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("term", pa.string()),
                pa.field("tf", pa.int64()),
                pa.field("df", pa.int64()),
            ]
        ),
    )

    # bucket docs (doc_id >> 12) so one map_groups call ranks up to 4096
    # docs — _rank_tf_table is per-doc-correct for any table holding every
    # row of each doc it contains, and bucket membership is a pure function
    # of doc_id, so buckets are complete (the pairverify PAIR_BUCKET move)
    def add_bucket(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        return batch.append_column("__b", pa.array(d >> 12))

    def rank_bucket(group: pa.Table) -> pa.Table:
        return _rank_tf_table(group.select(["doc_id", "term", "tf", "df"]), k)

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )
