"""Sources: the ``files`` corpus table and adapters.

The corpus *is* the listing — ``ray.data.read_parquet`` plays the role of
Europa's ``DirectoryReader.GetAllFilesFromFolderAsync``
(``/root/reference/Api/Implementations/Commons/DirectoryReader.cs:25-68``).
Column pruning at the read (``columns=[...]``) is the engine's version of
"only open what you need".
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import ray.data

from europa_ray.util import default_read_blocks

FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_files(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a ``files(repo,path,commit,lang,content)`` parquet table/dir.

    Block count targets ~8× cluster CPUs (measured knee, see
    ``util.default_read_blocks``) — fine-grained enough that the signature
    stage has no straggler tail, without Ray's default ~200-way split's
    per-block scheduling overhead on small clusters.
    """
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=default_read_blocks()
    )


def _normalize_files_schema(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Coerce an ingested table to the canonical ``files`` schema: required
    columns present (missing ones raise — a corpus without content is a
    config error, matching F4's fail-fast validation), ``content`` cast to
    string (CSV/JSON readers may infer null-typed or binary columns on
    sparse shards)."""
    import pyarrow as pa

    def coerce(batch: pa.Table) -> pa.Table:
        missing = [c for c in FILES_COLUMNS if c not in batch.column_names]
        if missing:
            raise ValueError(f"files corpus missing required columns: {missing}")
        out = batch.select(FILES_COLUMNS)
        for c in FILES_COLUMNS:
            col = out[c]
            typ = col.type if not isinstance(col, pa.ChunkedArray) else col.type
            if not (pa.types.is_string(typ) or pa.types.is_large_string(typ)):
                out = out.set_column(
                    out.column_names.index(c), c, col.cast(pa.string())
                )
        return out

    return ds.map_batches(coerce, batch_format="pyarrow")


def read_files_jsonl(path: str) -> ray.data.Dataset:
    """Read a ``files`` corpus from JSON-Lines shards (one object per line,
    keys = the files columns) — same discovery/parallelism semantics as the
    Parquet reader; schema normalized to the canonical shape."""
    ds = ray.data.read_json(path, override_num_blocks=default_read_blocks())
    return _normalize_files_schema(ds)


def read_files_csv(path: str) -> ray.data.Dataset:
    """Read a ``files`` corpus from CSV shards (header row, the files
    columns). Note CSV cannot represent embedded newlines portably across
    writers — prefer Parquet/JSONL for real corpora; this exists so a user
    ingesting legacy CSV listings gets the same pipeline surface."""
    ds = ray.data.read_csv(path, override_num_blocks=default_read_blocks())
    return _normalize_files_schema(ds)


# deterministic per-doc path extension (doc_id % 8) so the file-type
# identification chain (stages/classify.py) is exercised over real variety;
# index i maps to the kind the classifier assigns that extension
DOC_EXTS = ("py", "rs", "go", "java", "js", "c", "md", "txt")


def _docs_to_files(batch):
    """documents(doc_id,text,lang,source,n_chars) → files shape.

    Mapping per FIXTURES.md §3: text→content, source→repo, doc_id→path,
    lang→lang; ``commit`` synthesized deterministically from doc_id; the
    path extension cycles ``DOC_EXTS[doc_id % 8]`` (SQL-expressible, so the
    ``file_kind_counts`` DuckDB oracle can verify the classifier). doc_id
    is retained so driver queries can emit doc-level results.
    """
    import numpy as np
    import pyarrow as pa

    doc_id = batch["doc_id"]
    ids = doc_id.to_numpy() if not isinstance(doc_id, pa.ChunkedArray) else doc_id.combine_chunks().to_numpy()
    exts = np.asarray(DOC_EXTS, dtype=object)[ids % 8]
    commit = pc.utf8_lpad(pc.cast(doc_id, pa.string()), 40, "0")
    return pa.table(
        {
            "doc_id": doc_id,
            "repo": batch["source"],
            "path": pc.binary_join_element_wise(
                pc.cast(doc_id, pa.string()),
                pa.scalar("."),
                pa.array(exts, pa.string()),
                "",
            ),
            "commit": commit,
            "lang": batch["lang"],
            "content": batch["text"],
        }
    )


def read_documents_as_files(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Adapter: the driver's ``documents`` table in ``files`` shape
    (keeps ``doc_id`` as an identity column)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        override_num_blocks=default_read_blocks(),
    )
    ds = ds.map_batches(_docs_to_files, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds
