"""Deterministic near-duplicate augmentation of the driver's ``documents``
table: the test tables contain (almost) no planted near-dups, so the
conformance queries derive mutants from the input itself — every 5th doc
gets one mutant (every 11th token dropped) under a shifted doc_id. Pure
function of the input; no randomness."""

from __future__ import annotations

import pyarrow as pa
import ray.data

MUTANT_OFFSET = 10_000_000


def _mutate_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["content"].to_pylist()
    out_rows = {c: [] for c in batch.column_names}
    for i, (d, t) in enumerate(zip(doc_ids, texts)):
        if d % 5 != 0 or not t:
            continue
        toks = t.split(" ")
        kept = [w for j, w in enumerate(toks) if j % 11 != 0]
        mutant = " ".join(kept)
        for c in batch.column_names:
            if c == "doc_id":
                out_rows[c].append(d + MUTANT_OFFSET)
            elif c == "content":
                out_rows[c].append(mutant)
            elif c == "path":
                out_rows[c].append(f"{d + MUTANT_OFFSET}.txt")
            elif c == "commit":
                out_rows[c].append(str(d + MUTANT_OFFSET).rjust(40, "0"))
            else:
                out_rows[c].append(batch[c][i].as_py())
    return pa.table(
        {c: pa.array(out_rows[c], batch.schema.field(c).type) for c in batch.column_names}
    )


def with_mutants(files_ds: ray.data.Dataset) -> ray.data.Dataset:
    """files-shaped Dataset (with doc_id) ∪ deterministic mutants."""
    mutants = files_ds.map_batches(_mutate_batch, batch_format="pyarrow")
    return files_ds.union(mutants)
