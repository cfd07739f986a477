"""Content error routing: null/empty/invalid-UTF8 rows become data
(`error` column), clean rows pass through unchanged — the reference's
notification side-channel (DirectoryReader.cs:42-65) as a data column."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mixed_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "content": pa.array(["hello world", None, "", "ok", "fine"], pa.string()),
        }
    )


def _binary_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "content": pa.array(
                [b"valid utf8", b"\xff\xfe broken", None, b""], pa.binary()
            ),
        }
    )


def test_tag_string_column():
    from europa_ray.stages.errors import tag_content_errors

    t = tag_content_errors(_mixed_table())
    assert t["error"].to_pylist() == [None, "null_content", "empty_content", None, None]


def test_tag_binary_column_invalid_utf8():
    from europa_ray.stages.errors import tag_content_errors

    t = tag_content_errors(_binary_table())
    assert t["error"].to_pylist() == [None, "invalid_utf8", "null_content", "empty_content"]


def test_tag_all_clean_binary_fast_path():
    from europa_ray.stages.errors import tag_content_errors

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "content": pa.array([b"abc", "café".encode()], pa.binary()),
        }
    )
    out = tag_content_errors(t)
    assert out["error"].to_pylist() == [None, None]


def test_split_content_errors_dataset(ray_session):
    import ray.data

    from europa_ray.stages.errors import split_content_errors

    ds = ray.data.from_arrow(_mixed_table()).repartition(2)
    ok, errs = split_content_errors(ds)
    ok_t = ok.to_pandas().sort_values("doc_id")
    err_t = errs.to_pandas().sort_values("doc_id")
    assert ok_t.doc_id.tolist() == [1, 4, 5]
    assert "content" in ok_t.columns and "error" not in ok_t.columns
    assert err_t.doc_id.tolist() == [2, 3]
    assert err_t.error.tolist() == ["null_content", "empty_content"]
    assert "content" not in err_t.columns


def test_content_errors_query_runs(ray_session):
    """Driver-shape query over the error-augmented corpus: exactly the
    planted rows (every 53rd blanked, every 59th nulled; empty wins),
    schema intact. Value parity with the SQL CASE chain is in test_entry."""
    import __ray_entry__ as entry
    from europa_ray.sources.augment import ERR_EMPTY_EVERY, ERR_NULL_EVERY

    got = entry._collect(entry.queries()["content_errors"]("/root/testdata/sf0.01"))
    assert set(got.schema.names) == {"doc_id", "error"}
    by_id = dict(zip(got["doc_id"].to_pylist(), got["error"].to_pylist()))
    assert by_id, "planted error rows must be found"
    for d, err in by_id.items():
        if d % ERR_EMPTY_EVERY == 0:
            assert err == "empty_content"
        else:
            assert d % ERR_NULL_EVERY == 0 and err == "null_content"
