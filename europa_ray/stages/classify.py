"""File-type identification — the chain-of-responsibility classifier
(``/root/reference/Api/Implementations/SimilarImages/SimilarImageFinder.cs:
220-237`` dispatching over registered ``IFileTypeIdentifier`` chains,
``Program.cs:76-85``), re-expressed as a vectorized ``map_batches`` stage.

Identifiers run in registration order until one claims the row; unclaimed
rows get ``kind='unknown'`` routed to data (an ``error``-style column), not
a side channel (``:234-236`` pushes a notification instead).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# extension → kind chain, in priority order (first match wins)
_EXT_KINDS: list[tuple[str, tuple[str, ...]]] = [
    ("python", ("py", "pyi")),
    ("rust", ("rs",)),
    ("go", ("go",)),
    ("java", ("java",)),
    ("js", ("js", "jsx", "ts", "tsx")),
    ("c", ("c", "h", "cc", "cpp", "hpp")),
    ("md", ("md", "markdown")),
    ("txt", ("txt", "text")),
]
_LANG_KINDS = {k for k, _ in _EXT_KINDS}


def identify_kind(batch: pa.Table) -> pa.Table:
    """Append ``kind``: the ``lang`` column when it names a known kind (the
    primary identifier), else the path-extension chain (the fallback
    identifier — SF5, ``FileDto.cs:36``), else 'unknown'."""
    n = batch.num_rows
    kinds = np.full(n, "unknown", dtype=object)

    if "lang" in batch.column_names:
        langs = batch["lang"].to_pylist()
        for i, lg in enumerate(langs):
            if lg in _LANG_KINDS:
                kinds[i] = lg

    if "path" in batch.column_names:
        paths = batch["path"].to_pylist()
        ext_map = {e: k for k, exts in _EXT_KINDS for e in exts}
        for i, p in enumerate(paths):
            if kinds[i] != "unknown" or not p:
                continue
            dot = p.rfind(".")
            if dot >= 0:
                kinds[i] = ext_map.get(p[dot + 1 :].lower(), "unknown")
    return batch.append_column("kind", pa.array(kinds.tolist(), pa.string()))


def kind_counts(files_ds):
    """(kind, n_files) — the dispatch census."""
    return (
        files_ds.map_batches(identify_kind, batch_format="pyarrow")
        .select_columns(["kind"])
        .groupby("kind")
        .count()
        .rename_columns({"count()": "n_files"})
    )
