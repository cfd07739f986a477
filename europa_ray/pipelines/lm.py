"""Unigram language-model document scoring — the CCNet LM-quality signal
(Wenzek et al., LREC 2020 §4.3: documents are ranked by the perplexity of
a language model and the per-language head/middle/tail terciles drive
filtering). The sandbox ships no KenLM and no external model, so the LM
is the corpus's OWN unigram distribution (MLE: ``p(w) = c(w) / T`` over
single-space-split words — the exact tokenization of
:mod:`europa_ray.pipelines.vocab`, so the DuckDB oracle verifies the
scores value-for-value); ``lm_files`` scores one corpus under a model
trained on another (the real CCNet shape: Wikipedia-trained LM applied to
Common Crawl), where unseen words fall back to a Lidstone pseudo-count.

``lm_score(doc) = mean_w(-log10 p(w)) = log10(T) - mean_w(log10 c(w))``
— mean word surprisal in log10 units (the log of the per-word perplexity
up to base), averaged over token INSTANCES (multiplicity counts). Higher
= rarer vocabulary = further into the tail. Documents with zero tokens
(null/empty/whitespace-only content) are excluded, matching every other
content operator's predicate.

Scale shape (reference: Europa computes per-item signatures against
shared state loaded once per worker — `Core/FileProcessor` pattern;
SURVEY.md §2.2 ST1):

* model train: the vocabulary aggregate of :mod:`vocab` — per-batch
  partial counts, vocabulary-sized ``groupby().sum()`` (Zipf ≪ corpus).
* broadcast path (vocab ≤ ``vocab_broadcast_max``): the (word, log10 c)
  table is ``ray.put`` ONCE and cached per worker process (module-level
  cache keyed by the object ref — the :mod:`decontam` pattern); scoring
  is one content pass, vectorized `pc.index_in` + prefix-sum segment
  means, NO shuffle of the corpus. This is the true 100-TB path: a
  trained LM is a fixed-size artifact, exactly what CCNet broadcasts.
* join fallback (forced with ``vocab_broadcast_max=0``; equivalence-
  tested): per-doc DISTINCT (doc_id, word, k) rows hash-join the vocab
  table on ``word``, partial per-doc sums combine in-batch, one doc-sized
  ``groupby().sum()`` — shuffle volume O(distinct words per doc), never
  O(corpus bytes).

SQL replica (self-trained): ``log10(T) - avg(log10(c(w)))`` over the
unnested token stream joined to its own frequency table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from europa_ray.pipelines.vocab import _partial_word_counts

LM_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("lang", pa.string()),
        pa.field("n_tokens", pa.int64()),
        pa.field("lm_score", pa.float64()),
    ]
)

_WORKER_VOCAB_CACHE: dict = {}  # per worker process: ref.hex() → (words, logc)


def _unigram_vocab(
    files: ray.data.Dataset, text_col: str, gather_max_rows: int = 50_000_000
) -> ray.data.Dataset:
    """(word, n) vocabulary Dataset — delegates to
    :func:`europa_ray.pipelines.vocab.word_count_table` (size-dispatched
    driver fold / distributed groupby; round-5 consolidation)."""
    from europa_ray.pipelines.vocab import word_count_table

    return word_count_table(
        files, text_col=text_col, gather_max_rows=gather_max_rows
    )


def _split_tokens(col) -> tuple[pa.Array, np.ndarray]:
    """Single-space-split a string column → (flat token array, row offsets
    normalized to start at 0). Empty-string tokens stay in place (masked
    by the caller) so offsets keep their row alignment."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    split = pc.split_pattern(col, " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    off = split.offsets.to_numpy().astype(np.int64)
    off = off - off[0]
    flat = pc.list_flatten(split)
    return flat, off


def _segment_stats(
    contrib: np.ndarray, mask: np.ndarray, off: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (sum of contrib where mask, count of mask) via prefix sums
    — safe for empty rows, unlike ``np.add.reduceat``."""
    cs = np.concatenate([[0.0], np.cumsum(np.where(mask, contrib, 0.0))])
    cn = np.concatenate([[0], np.cumsum(mask.astype(np.int64))])
    return cs[off[1:]] - cs[off[:-1]], cn[off[1:]] - cn[off[:-1]]


def unigram_lm_scores(
    files: ray.data.Dataset,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lm_files: ray.data.Dataset | None = None,
    unseen_count: float = 0.5,
    vocab_broadcast_max: int = 30_000_000,
) -> ray.data.Dataset:
    """Per-document unigram-LM surprisal (see module docstring).

    Returns ``(doc_id, lang, n_tokens, lm_score)``; ``lm_score`` is the
    raw double (callers round for display/oracle comparison).
    """
    if unseen_count <= 0:
        raise ValueError("unseen_count must be > 0")
    vocab = _unigram_vocab(lm_files if lm_files is not None else files, text_col)

    n_words = vocab.count()
    if n_words == 0:
        return ray.data.from_arrow(LM_SCHEMA.empty_table())
    unseen_log10 = float(np.log10(unseen_count))

    if n_words <= vocab_broadcast_max:
        return _score_broadcast(
            files, vocab, unseen_log10,
            text_col=text_col, id_col=id_col, lang_col=lang_col,
        )
    # one tiny aggregate over the vocabulary-sized table (the broadcast
    # path folds the total into its gather instead of a second pass)
    log_total = float(np.log10(int(vocab.sum("n"))))
    return _score_join(
        files, vocab, log_total, unseen_log10,
        text_col=text_col, id_col=id_col, lang_col=lang_col,
    )


def _score_broadcast(
    files, vocab, unseen_log10: float,
    *, text_col: str, id_col: str, lang_col: str,
) -> ray.data.Dataset:
    words_p: list[pa.Array] = []
    counts_p: list[np.ndarray] = []
    for b in vocab.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        words_p.extend(b["word"].chunks)
        counts_p.append(b["n"].to_numpy().astype(np.int64))
    words = pa.chunked_array(words_p).combine_chunks()
    counts = np.concatenate(counts_p)
    log_total = float(np.log10(int(counts.sum())))
    logc = np.log10(counts.astype(np.float64))
    ref = ray.put((words, logc))

    def score(batch: pa.Table) -> pa.Table:
        key = ref.hex()
        model = _WORKER_VOCAB_CACHE.get(key)
        if model is None:
            _WORKER_VOCAB_CACHE.clear()  # one LM live per worker
            model = _WORKER_VOCAB_CACHE[key] = ray.get(ref)
        vwords, vlogc = model

        col = batch[text_col]
        valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
        sub = batch.filter(valid)
        if sub.num_rows == 0:
            return LM_SCHEMA.empty_table()
        flat, off = _split_tokens(sub[text_col])
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = pc.fill_null(
            pc.index_in(flat, value_set=vwords), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_logc = np.where(idx >= 0, vlogc[np.maximum(idx, 0)], unseen_log10)
        sums, counts = _segment_stats(tok_logc, mask, off)
        keep = counts > 0
        score = log_total - sums[keep] / counts[keep]
        kept = sub.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": kept[id_col].cast(pa.int64()),
                "lang": kept[lang_col].cast(pa.string()),
                "n_tokens": pa.array(counts[keep].astype(np.int64)),
                "lm_score": pa.array(score),
            }
        )

    return files.map_batches(score, batch_format="pyarrow")


def _score_join(
    files, vocab, log_total: float, unseen_log10: float,
    *, text_col: str, id_col: str, lang_col: str,
) -> ray.data.Dataset:
    """Distributed fallback: per-doc distinct (doc, word, k) joins the
    vocab table; in-batch partial sums then one doc-sized groupby."""
    from europa_ray.util import default_num_partitions, scrub_empty_blocks

    nparts = default_num_partitions()

    def doc_words(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
        sub = batch.filter(valid)
        empty = pa.table(
            {
                "__doc": pa.array([], pa.int64()),
                "__lang": pa.array([], pa.string()),
                "word": pa.array([], pa.string()),
                "k": pa.array([], pa.int64()),
            }
        )
        if sub.num_rows == 0:
            return empty
        flat, off = _split_tokens(sub[text_col])
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n = len(flat)
        row_of = np.repeat(
            np.arange(sub.num_rows, dtype=np.int64), np.diff(off)
        )
        ids = sub[id_col].cast(pa.int64()).to_numpy()
        langs = sub[lang_col].cast(pa.string())
        if not mask.any():
            return empty
        t = pa.table(
            {
                "__doc": pa.array(ids[row_of[mask]]),
                "__lang": langs.combine_chunks().take(
                    pa.array(row_of[mask], pa.int64())
                ),
                "word": flat.filter(pa.array(mask)),
            }
        )
        g = t.group_by(["__doc", "__lang", "word"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "__doc": g["__doc"],
                "__lang": g["__lang"],
                "word": g["word"],
                "k": g["count_all"].cast(pa.int64()),
            }
        )

    tokens = files.map_batches(doc_words, batch_format="pyarrow")
    vocab_side = vocab.map_batches(
        lambda b: pa.table(
            {
                "__w": b["word"],
                "__logc": pa.array(
                    np.log10(b["n"].to_numpy().astype(np.float64))
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    joined = tokens.join(
        vocab_side, join_type="left_outer", num_partitions=nparts,
        on=("word",), right_on=("__w",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {
                    "__doc": pa.array([], pa.int64()),
                    "__lang": pa.array([], pa.string()),
                    "s": pa.array([], pa.float64()),
                    "m": pa.array([], pa.int64()),
                }
            )
        k = batch["k"].to_numpy().astype(np.float64)
        lc = batch["__logc"].to_numpy(zero_copy_only=False)
        lc = np.where(np.isnan(lc), unseen_log10, lc)
        t = pa.table(
            {
                "__doc": batch["__doc"],
                "__lang": batch["__lang"],
                "ks": pa.array(k * lc),
                "k": batch["k"],
            }
        )
        g = t.group_by(["__doc", "__lang"]).aggregate(
            [("ks", "sum"), ("k", "sum")]
        )
        return pa.table(
            {
                "__doc": g["__doc"],
                "__lang": g["__lang"],
                "s": g["ks_sum"],
                "m": g["k_sum"].cast(pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["__doc", "__lang"])
        .sum(["s", "m"])
    )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return LM_SCHEMA.empty_table()
        m = batch["sum(m)"].to_numpy().astype(np.int64)
        s = batch["sum(s)"].to_numpy()
        return pa.table(
            {
                "doc_id": batch["__doc"].cast(pa.int64()),
                "lang": batch["__lang"].cast(pa.string()),
                "n_tokens": pa.array(m),
                "lm_score": pa.array(log_total - s / np.maximum(m, 1)),
            }
        )

    out = agg.map_batches(final, batch_format="pyarrow")
    return scrub_empty_blocks(out.materialize(), LM_SCHEMA)


def lm_quality_buckets(
    files: ray.data.Dataset,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lm_files: ray.data.Dataset | None = None,
    vocab_broadcast_max: int = 30_000_000,
) -> ray.data.Dataset:
    """CCNet head/middle/tail bucketing on the unigram-LM score — the
    LM-backed twin of :func:`textstats.quality_buckets` (which uses the
    alpha-ppm proxy). The double score is fixed to integer micro-units
    with ``floor(x * 1e6 + 0.5)`` (half-up on BOTH sides — numpy round is
    banker's, DuckDB round is half-away; floor(+0.5) is identical in
    both), then the shared per-language exact-tercile machinery labels
    every document. NOTE: lower surprisal = more fluent under the LM, so
    ``head`` here is the LOW-score tercile — the labeling flips the sign
    going into the shared (score ≤ cutoff → tail) machinery."""
    from europa_ray.pipelines.textstats import bucket_scored_by_lang_terciles

    scores = unigram_lm_scores(
        files,
        text_col=text_col, id_col=id_col, lang_col=lang_col,
        lm_files=lm_files, vocab_broadcast_max=vocab_broadcast_max,
    )

    def to_int(batch: pa.Table) -> pa.Table:
        raw = batch["lm_score"].to_numpy()
        micro = np.floor(raw * 1_000_000 + 0.5).astype(np.int64)
        # negate: tercile machinery labels low scores "tail"; for
        # surprisal LOW is fluent (head), HIGH is tail
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "score": pa.array(-micro),
            }
        )

    scored = scores.map_batches(to_int, batch_format="pyarrow").materialize()
    return bucket_scored_by_lang_terciles(scored)
