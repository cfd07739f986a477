"""File-type identification — the chain-of-responsibility classifier
(``/root/reference/Api/Implementations/SimilarImages/SimilarImageFinder.cs:
220-237`` dispatching over registered ``IFileTypeIdentifier`` chains,
``Program.cs:76-85``), re-expressed as a vectorized ``map_batches`` stage.

Identifiers run in registration order until one claims the row; unclaimed
rows get ``kind='unknown'`` routed to data (an ``error``-style column), not
a side channel (``:234-236`` pushes a notification instead).
"""

from __future__ import annotations

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


_EXT_MAP = {e: k for k, exts in _EXT_KINDS for e in exts}


def _dict_mapped(col: pa.Array | pa.ChunkedArray, mapper) -> pa.Array:
    """Map a low-cardinality string column through ``mapper(value) -> str |
    None`` by dictionary-encoding: Python runs once per DISTINCT value, the
    per-row work is a vectorized ``take``. Nulls map to null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    mapped = pa.array(
        [mapper(v) for v in enc.dictionary.to_pylist()], pa.string()
    )
    if len(mapped) == 0:
        return pa.nulls(len(col), pa.string())
    return mapped.take(enc.indices)


def identify_kind(batch: pa.Table) -> pa.Table:
    """Append ``kind``: the ``lang`` column when it names a known kind (the
    primary identifier), else the path-extension chain (the fallback
    identifier — SF5, ``FileDto.cs:36``), else 'unknown'.

    Fully vectorized: both identifier chains are dictionary-encoded maps
    (Python per distinct value only) combined with one ``coalesce`` —
    no per-row Python, no ``to_pylist`` over row data."""
    n = batch.num_rows
    lang_kind = pa.nulls(n, pa.string())
    if "lang" in batch.column_names:
        lang_kind = _dict_mapped(
            batch["lang"], lambda v: v if v in _LANG_KINDS else None
        )
    ext_kind = pa.nulls(n, pa.string())
    if "path" in batch.column_names:
        path = batch["path"]
        if isinstance(path, pa.ChunkedArray):
            path = path.combine_chunks()
        # extension = chars after the LAST dot (rfind semantics: [^.]* may
        # span '/', such values simply miss the map → unknown)
        ext_struct = pc.extract_regex(path, r"\.(?P<ext>[^.]*)$")
        ext = pc.utf8_lower(pc.struct_field(ext_struct, "ext"))
        ext_kind = _dict_mapped(ext, lambda v: _EXT_MAP.get(v) if v else None)
    kind = pc.coalesce(lang_kind, ext_kind, pa.scalar("unknown", pa.string()))
    return batch.append_column("kind", kind)


def kind_counts(files_ds):
    """(kind, n_files) — the dispatch census."""
    return (
        files_ds.map_batches(identify_kind, batch_format="pyarrow")
        .select_columns(["kind"])
        .groupby("kind")
        .count()
        .rename_columns({"count()": "n_files"})
    )
