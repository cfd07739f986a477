"""Normalization-tier dedup (pipelines/normdedup.py): kernel parity with the
DuckDB oracle expression, planted format-mutant detection, tier accounting."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

NASTY = [
    "the fast key order sort",
    "a # comment here\nnext LINE\tstuff",
    "x // slash comment\ny",
    "  LEAD and trail  ",
    "MiXeD  Case\r\nwindows",
    "#only comment",
    "a#b",
    "tabs\t\tand   spaces",
    "slash / not comment",
    "",
]

_SQL_NORM = (
    "trim(regexp_replace(lower(regexp_replace(text, "
    "'(//|#)[^' || chr(10) || ']*', '', 'g')), "
    "'[ ' || chr(9) || chr(13) || chr(10) || ']+', ' ', 'g'), ' ')"
)


def _files(rows: list[tuple[int, str]]):
    import ray.data

    n = len(rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "repo": pa.array(["r"] * n, pa.string()),
                "path": pa.array([f"{i}.py" for i in range(n)], pa.string()),
                "commit": pa.array(["0" * 40] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "content": pa.array([c for _, c in rows], pa.string()),
            }
        )
    )


def test_normalize_kernel_matches_duckdb_re2():
    from europa_ray.pipelines.normdedup import normalize_code_arrow

    eng = normalize_code_arrow(pa.array(NASTY, pa.string())).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(NASTY))), "text": NASTY}))
    ora = [r[0] for r in con.sql(f"SELECT {_SQL_NORM} FROM t ORDER BY i").fetchall()]
    assert eng == ora


def test_norm_dup_members_finds_format_variants_exact_does_not(ray_session):
    from europa_ray.pipelines.exact import exact_dup_clusters
    from europa_ray.pipelines.normdedup import norm_dup_members

    rows = [
        (1, "def main():\n    return 1\n"),
        (2, "# vendored copy\nDEF MAIN():\n\treturn   1\n"),  # norm-equal to 1
        (3, "def other():\n    return 2\n"),
        (4, "def other():\n    return 2\n"),  # byte-exact dup of 3
        (5, "totally unique body"),
    ]
    ds = _files(rows)
    norm = norm_dup_members(ds, id_cols=("doc_id",)).to_pandas()
    exact = exact_dup_clusters(ds, id_cols=("doc_id",)).to_pandas()
    # exact tier: only the byte-identical pair
    assert sorted(exact.doc_id) == [3, 4]
    # norm tier: the format-variant pair AND the byte-exact pair
    assert sorted(norm.doc_id) == [1, 2, 3, 4]
    by_sha = norm.groupby("norm_sha256").doc_id.apply(sorted).tolist()
    assert sorted(map(tuple, by_sha)) == [(1, 2), (3, 4)]


def test_dedup_tiers_accounting(ray_session):
    from europa_ray.pipelines.normdedup import dedup_tiers

    rows = [
        (1, "alpha beta"),
        (2, "alpha beta"),          # exact dup of 1
        (3, "ALPHA   beta # c"),    # norm dup of 1, not exact
        (4, "gamma"),
        (5, ""),                    # dropped (empty)
        (6, "# all comment"),       # normalizes to empty -> raw identity
    ]
    t = dedup_tiers(_files(rows), id_col="doc_id")
    r = {c: t[c][0].as_py() for c in t.column_names}
    assert r == {
        "n_rows": 5,
        "n_exact_distinct": 4,
        "n_norm_distinct": 3,
        "exact_dup_rows": 1,
        "norm_extra_dup_rows": 1,
    }


def test_norm_dup_members_empty_corpus(ray_session):
    from europa_ray.pipelines.normdedup import norm_dup_members

    out = norm_dup_members(_files([(1, "# only a comment")]), id_cols=("doc_id",))
    assert out.count() == 0
