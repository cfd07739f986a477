"""Sequence-packing plan — the concatenate-then-chunk layout step a
pretraining pipeline runs after mixing/sampling: documents are laid out in
one deterministic global order and the token stream is cut into fixed
``seq_len`` training sequences (GPT-style packing; Brown et al. 2020 §2.1
train on documents "packed" into 2048-token contexts). The operator emits
the PLAN — for every document its global token offset and the sequence its
first token lands in — not the token stream itself (tokenization happens at
materialization time; the plan is what the data loader needs to shard work).

Order is the canonical ``(u64(sha256(content)), doc_id)`` key shared with
the sampling operators (:mod:`europa_ray.pipelines.sampling`), so the
layout is reproducible across re-crawls, partition layouts and cluster
sizes, and composes with ``hash_sample`` / ``token_budget_sample`` /
``mixture_sample`` (their kept subsets are prefixes/filters of the same
order).

Output: ``(doc_id, lang, n_tokens, start_tok, seq_id)`` where ``start_tok``
is the running token count of every earlier document (the document's first
token's global offset) and ``seq_id = start_tok // seq_len``. A document
may span several sequences; ``seq_id`` names the first (the loader derives
the rest from ``start_tok + n_tokens``). Empty/null content is excluded
(same predicate as every other content operator).

Scale shape — a global prefix sum needs a global total order, so unlike the
samplers this operator cannot avoid ordering work; it orders METADATA only
(~40 B/row; content never leaves the first pass):

* driver path (≤ ``driver_max_keys`` rows): stream the metadata to the
  driver, one lexsort + cumsum — no shuffle at all.
* distributed path: one metadata-only ``Dataset.sort`` on the canonical
  key (range-partitioned, content-free), per-block token sums gathered in
  block order (one tiny ray task per block), an exclusive prefix over the
  ≤ n_blocks sums on the driver, then one task per block attaching its
  base offset. Equivalence-tested by forcing the budget to 0.

SQL replica: one windowed running sum —
``sum(n_tokens) OVER (ORDER BY u, doc_id) - n_tokens``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

PACKING_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("lang", pa.string()),
        pa.field("n_tokens", pa.int64()),
        pa.field("start_tok", pa.int64()),
        pa.field("seq_id", pa.int64()),
    ]
)

_U64 = np.uint64
_SIGN = np.uint64(1) << np.uint64(63)


def _plan_block(
    block: pa.Table, base: int, seq_len: int, id_col: str, lang_col: str
) -> pa.Table:
    tok = block["n_tokens"].to_numpy()
    start = base + np.cumsum(tok) - tok
    return pa.table(
        {
            "doc_id": block[id_col].cast(pa.int64()),
            "lang": block[lang_col].cast(pa.string()),
            "n_tokens": pa.array(tok.astype(np.int64)),
            "start_tok": pa.array(start.astype(np.int64)),
            "seq_id": pa.array((start // seq_len).astype(np.int64)),
        }
    )


def packing_plan(
    files: ray.data.Dataset,
    *,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    content_col: str = "content",
    driver_max_keys: int = 100_000_000,
) -> ray.data.Dataset:
    """Global packing plan over the corpus in canonical (sha256, id) order
    — see the module docstring for semantics and the two execution paths."""
    if seq_len <= 0:
        raise ValueError("seq_len must be > 0")
    from europa_ray.pipelines.sampling import _budget_meta

    meta = files.map_batches(
        _budget_meta,
        fn_kwargs={"id_col": id_col, "lang_col": lang_col, "content_col": content_col},
        batch_format="pyarrow",
    ).materialize()

    # ---- budget check: stream the metadata to the driver if small
    ids_p, lang_p, tok_p, u_p = [], [], [], []
    total, over = 0, False
    for b in meta.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += b.num_rows
        if total > driver_max_keys:
            over = True
            break
        ids_p.append(b[id_col].to_numpy())
        # keep langs as Arrow (not Python objects): ~bytes/row, not ~60 B/row
        lang_p.extend(b[lang_col].chunks)
        tok_p.append(b["n_tokens"].to_numpy())
        u_p.append(b["sha64"].to_numpy().view(_U64))

    if over:
        return _packing_plan_distributed(
            meta, seq_len, id_col=id_col, lang_col=lang_col
        )

    if not ids_p:
        return ray.data.from_arrow(PACKING_SCHEMA.empty_table())

    ids = np.concatenate(ids_p)
    tok = np.concatenate(tok_p)
    u = np.concatenate(u_p)
    order = np.lexsort((ids, u))
    langs = pa.chunked_array(lang_p or [pa.array([], pa.string())]).take(
        pa.array(order, pa.int64())
    )
    ids, tok = ids[order], tok[order]
    start = np.cumsum(tok) - tok
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "lang": langs.cast(pa.string()),
                "n_tokens": pa.array(tok.astype(np.int64)),
                "start_tok": pa.array(start.astype(np.int64)),
                "seq_id": pa.array((start // seq_len).astype(np.int64)),
            }
        )
    )


def _packing_plan_distributed(
    meta: ray.data.Dataset, seq_len: int, *, id_col: str, lang_col: str
) -> ray.data.Dataset:
    """Metadata-only global sort + per-block exclusive prefix sums.

    The sort key is the sha64 column remapped through a sign-bit flip
    (``u64 → u64 - 2^63`` viewed as int64) so int64 sort order equals the
    unsigned hash order the driver path (and the SQL oracle's UBIGINT
    ``ORDER BY u``) uses."""

    def add_key(batch: pa.Table) -> pa.Table:
        u = batch["sha64"].to_numpy().view(_U64)
        okey = (u ^ _SIGN).view(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                lang_col: batch[lang_col],
                "n_tokens": batch["n_tokens"],
                "__okey": pa.array(okey),
            }
        )

    sorted_meta = (
        meta.map_batches(add_key, batch_format="pyarrow")
        .sort(["__okey", id_col])
        .materialize()
    )

    from europa_ray.util import dataset_block_refs

    refs = dataset_block_refs(sorted_meta)
    if not refs:
        return ray.data.from_arrow(PACKING_SCHEMA.empty_table())

    @ray.remote
    def block_sum(block: pa.Table) -> int:
        return int(np.sum(block["n_tokens"].to_numpy())) if block.num_rows else 0

    sums = ray.get([block_sum.remote(r) for r in refs])  # n_blocks ints
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def plan(block: pa.Table, base: int) -> pa.Table:
        if block.num_rows == 0:
            return PACKING_SCHEMA.empty_table()
        return _plan_block(block, int(base), seq_len, id_col, lang_col)

    out_refs = [plan.remote(r, int(b)) for r, b in zip(refs, bases)]
    return ray.data.from_arrow_refs(out_refs)
