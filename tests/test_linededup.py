"""Line-level dedup (C4/CCNet-style): hand-computed truth on a tiny
corpus, DuckDB oracle parity at sf0.001, and forced-budget-0 equivalence
of the distributed fallback against the driver fast path."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from europa_ray.pipelines.linededup import line_dedup_stats, line_dup_stats


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, ray.data.Dataset):
        tables = [t for t in result.iter_batches(batch_format="pyarrow") if t.num_rows]
        if not tables:
            return result.schema().base_schema.empty_table().to_pandas()
        return pa.concat_tables(tables).to_pandas()
    return result.to_pandas()


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


LONG_A = "this shared line is long enough to be dedupable indeed"
LONG_B = "another shared dedupable line that also clears the bar"
UNIQ = "a unique line comfortably above the thirty char cutoff"


@pytest.fixture(scope="module")
def tiny(ray_session):
    docs = [
        # doc 1: keeper of LONG_A (twice within-doc: both kept) + short line
        (1, f"{LONG_A}\nshort\n{LONG_A}"),
        # doc 2: LONG_A dropped once; LONG_B keeper
        (2, f"{LONG_A}\n{LONG_B}"),
        # doc 3: LONG_A dropped twice, LONG_B dropped once, unique kept
        (3, f"{LONG_A}\n{UNIQ}\n{LONG_A}\n{LONG_B}"),
        # doc 4: only short lines → marker-row path
        (4, "a\nb\nc"),
        # doc 5: empty text → one empty line
        (5, ""),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "content": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )


def test_dup_stats_tiny(tiny):
    got = _to_df(line_dup_stats(tiny)).sort_values("line_sha").reset_index(drop=True)
    want = pd.DataFrame(
        {
            "line_sha": [_sha(LONG_A), _sha(LONG_B)],
            "n_occ": [5, 2],
            "n_docs": [3, 2],
        }
    ).sort_values("line_sha").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_dedup_stats_tiny(tiny):
    got = _to_df(line_dedup_stats(tiny))
    want = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "n_lines": [3, 2, 4, 3, 1],
            # doc1 keeper (both LONG_A kept); doc2 drops LONG_A; doc3 drops
            # LONG_A ×2 + LONG_B; docs 4/5 nothing dedupable
            "n_kept": [3, 1, 1, 3, 1],
            "n_dropped": [0, 1, 3, 0, 0],
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_null_content_excluded(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "content": pa.array([LONG_A, None], pa.string()),
            }
        )
    )
    got = _to_df(line_dedup_stats(ds))
    assert list(got.doc_id) == [1]


def test_forced_distributed_equivalence(tiny):
    """Budget 0 forces the groupby/join fallback — must be value-identical
    to the driver fast path on both outputs."""
    for fn in (line_dup_stats, line_dedup_stats):
        fast = _to_df(fn(tiny))
        slow = _to_df(fn(tiny, driver_max_rows=0))
        key = list(fast.columns)
        f = fast.sort_values(key).reset_index(drop=True)
        s = slow[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(f, s, check_dtype=False)


def test_line_docs_oracle_parity_sf0001(ray_session):
    """Engine vs DuckDB oracle at sf0.001 — the driver's gate, pre-run."""
    import duckdb

    import __ray_entry__ as entry

    for name in ("line_dup_stats", "line_dedup_stats"):
        got = entry.queries()[name]("/root/testdata/sf0.001").to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        want = con.execute(entry.oracle_sql()[name]).df()
        key = sorted(got.columns)
        g = got[key].sort_values(key).reset_index(drop=True)
        w = want[key].sort_values(key).reset_index(drop=True)
        assert len(g) > 0, f"{name} is vacuous"
        pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_marker_and_empty_schema_stability(ray_session):
    """Batches that explode to zero dedupable lines and fully-null batches
    must keep the canonical rows schema (the sigcache empty-batch lesson)."""
    from europa_ray.pipelines.linededup import _ROWS_SCHEMA, _explode_lines

    nul = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "content": pa.array([None], pa.string()),
        }
    )
    short = pa.table(
        {
            "doc_id": pa.array([8], pa.int64()),
            "content": pa.array(["x\ny"], pa.string()),
        }
    )
    for b in (nul, short):
        out = _explode_lines(b)
        assert out.schema.names == _ROWS_SCHEMA.names
        assert [f.type for f in out.schema] == [f.type for f in _ROWS_SCHEMA]
    assert _explode_lines(short)["occ"].to_pylist() == [0]


def test_line_dedup_tiny_corpus_distributed(ray_session):
    """Two-doc corpus with one duplicated dedupable line, forced
    distributed — regression for groupby-emitted zero-column blocks."""
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.linededup import line_dedup_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "content": pa.array(["x" * 40 + "\nfiller", "x" * 40], pa.string()),
        }
    )
    got = line_dedup_stats(
        ray.data.from_arrow(t).repartition(3), driver_max_rows=0
    )
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert df.doc_id.tolist() == [1, 2]
    assert df.n_dropped.tolist() == [0, 1]
