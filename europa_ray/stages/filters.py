"""Input predicates — Europa's ``FileFilter`` semantics re-expressed as
vectorized Arrow compute inside ``map_batches``.

Reference: ``/root/reference/Api/Implementations/Commons/FileFilter.cs:7-28``
and precedence at ``DirectoryReader.cs:80-82``:
  - include-list empty ⇒ everything included; non-empty ⇒ only listed langs,
    and the exclude-list is IGNORED (include wins);
  - exclude-list applies only when include-list is empty;
  - size bounds each optional, inclusive.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from europa_ray.config import EngineConfig


def _filter_batch(batch: pa.Table, cfg: EngineConfig) -> pa.Table:
    mask = pc.is_valid(batch["content"])
    if cfg.include_langs:
        mask = pc.and_(mask, pc.is_in(batch["lang"], value_set=pa.array(list(cfg.include_langs))))
    elif cfg.exclude_langs:
        mask = pc.and_(
            mask, pc.invert(pc.is_in(batch["lang"], value_set=pa.array(list(cfg.exclude_langs))))
        )
    if cfg.min_size is not None or cfg.max_size is not None:
        size = pc.utf8_length(batch["content"])
        if cfg.min_size is not None:
            mask = pc.and_(mask, pc.greater_equal(size, cfg.min_size))
        if cfg.max_size is not None:
            mask = pc.and_(mask, pc.less_equal(size, cfg.max_size))
    return batch.filter(mask)


def apply_filters(ds, cfg: EngineConfig):
    """Apply include/exclude/size predicates as a zero-copy Arrow stage."""
    if not (cfg.include_langs or cfg.exclude_langs or cfg.min_size is not None or cfg.max_size is not None):
        return ds
    return ds.map_batches(lambda b: _filter_batch(b, cfg), batch_format="pyarrow")
