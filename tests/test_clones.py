"""Type-2 parameterized clone detection (pipelines/clones.py): canonical-form
semantics vs a per-row pure-Python reference, DuckDB SQL parity, planted
rename-mutant detection, batch-split invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest


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


def _ref_canonical(text: str | None) -> str:
    """Per-row reference implementation of the P-string (the slow obvious
    way: normalize, split, first-occurrence ranks)."""
    import re

    if not text:
        return ""
    n = re.sub(r"(//|#)[^\n]*", "", text).lower()
    n = re.sub(r"[ \t\r\n]+", " ", n).strip(" ")
    if not n:
        return ""
    ranks: dict[str, int] = {}
    out = []
    for tok in n.split(" "):
        if tok not in ranks:
            ranks[tok] = len(ranks)
        out.append(f"t{ranks[tok]}")
    return " ".join(out)


CASES = [
    "aa bb aa cc",
    "xx yy xx zz",
    "aa bb cc aa",
    "# comment only",
    "",
    None,
    "The   SCAN  is\tfast // trailing",
    "one",
    "repeat repeat repeat",
    "a b c d e f g a b c",
    "tabs\t\tand   spaces",
    "Case CASE case cAsE",
]


def test_param_canonical_matches_reference():
    from europa_ray.pipelines.clones import param_canonical_arrow

    got = param_canonical_arrow(pa.array(CASES, pa.string())).to_pylist()
    want = [_ref_canonical(c) for c in CASES]
    assert got == want


def test_param_canonical_random_matches_reference():
    """200 random word-salad docs (shared small vocab → heavy token repeats,
    the regime where rank bookkeeping can go wrong) against the per-row
    reference, single batch — exercises the cross-doc composite-key path."""
    from europa_ray.pipelines.clones import param_canonical_arrow

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(17)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 40)).tolist())
        for _ in range(200)
    ]
    got = param_canonical_arrow(pa.array(docs, pa.string())).to_pylist()
    assert got == [_ref_canonical(d) for d in docs]


def test_param_canonical_batch_split_invariant():
    """The canonical form is per-row: computing it in one batch or row-by-row
    must agree (guards any cross-document leakage through the composite
    keys)."""
    from europa_ray.pipelines.clones import param_canonical_arrow

    whole = param_canonical_arrow(pa.array(CASES, pa.string())).to_pylist()
    single = [
        param_canonical_arrow(pa.array([c], pa.string())).to_pylist()[0]
        for c in CASES
    ]
    assert whole == single


def test_param_canonical_matches_duckdb_sql():
    """Byte-parity with the oracle_sql() canon chain on nasty inputs —
    the digest-valued group id requires identical serialization."""
    from europa_ray.pipelines.clones import param_canonical_arrow

    docs = [c for c in CASES if c]  # SQL side filters null/empty upfront
    got = {
        i: c
        for i, c in enumerate(
            param_canonical_arrow(pa.array(docs, pa.string())).to_pylist()
        )
        if c
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (SELECT unnest(range(%d)) AS doc_id, "
        "unnest($1::VARCHAR[]) AS text)" % len(docs),
        [docs],
    )
    sql = """
        WITH norm AS (
            SELECT doc_id, trim(regexp_replace(lower(regexp_replace(text,
                     '(//|#)[^' || chr(10) || ']*', '', 'g')),
                     '[ ' || chr(9) || chr(13) || chr(10) || ']+', ' ', 'g'),
                     ' ') AS n
            FROM docs WHERE text IS NOT NULL AND length(text) > 0
        ),
        lists AS (SELECT doc_id, string_split(n, ' ') AS l FROM norm WHERE length(n) > 0),
        toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(1, len(l)+1)) AS pos FROM lists),
        firsts AS (SELECT doc_id, tok, min(pos) AS fp FROM toks GROUP BY doc_id, tok),
        ranked AS (SELECT doc_id, tok,
                          dense_rank() OVER (PARTITION BY doc_id ORDER BY fp) - 1 AS r
                   FROM firsts),
        canon AS (
            SELECT t.doc_id, string_agg('t' || r.r, ' ' ORDER BY t.pos) AS cform
            FROM toks t JOIN ranked r ON t.doc_id = r.doc_id AND t.tok = r.tok
            GROUP BY t.doc_id
        )
        SELECT doc_id, cform FROM canon
    """
    want = dict(con.execute(sql).fetchall())
    assert got == {int(k): v for k, v in want.items()}


def test_type2_groups_planted_renames(ray_session):
    """A consistent bijective rename groups; an INCONSISTENT rename (same
    token renamed two different ways) must NOT group."""
    from europa_ray.pipelines.clones import type2_clone_members

    rows = [
        (0, "alpha beta alpha gamma"),
        (1, "x1 y2 x1 z3"),            # consistent rename of 0
        (2, "alpha beta gamma alpha"),  # different structure
        (3, "p q r s"),                 # all-distinct quad ...
        (4, "a b c d"),                 # ... clone of 3
        (5, "a b c c"),                 # repeat at the end: not a clone of 3
    ]
    out = type2_clone_members(_files(rows), id_cols=("doc_id",)).to_pandas()
    groups = out.groupby("p_sha256")["doc_id"].apply(sorted).tolist()
    assert sorted(map(tuple, groups)) == [(0, 1), (3, 4)]


def test_with_rename_mutants_detected_only_by_type2(ray_session):
    """The fixture's mutants are invisible to BOTH the exact and norm tiers
    (byte- and normalization-distinct when 'scan' occurs) yet group under
    Type-2 — the tier does real work beyond normalization."""
    from europa_ray.pipelines.clones import type2_clone_members
    from europa_ray.pipelines.normdedup import normalize_code_arrow
    from europa_ray.sources.augment import (
        RENAME_EVERY,
        RENAME_OFFSET,
        RENAME_RESIDUE,
        with_rename_mutants,
    )

    rows = [
        (RENAME_RESIDUE, "the scan is fast scan wins"),
        (RENAME_RESIDUE + RENAME_EVERY, "no match here"),
        (RENAME_RESIDUE + 2 * RENAME_EVERY, "scan once"),
        (2, "unselected residue with scan"),
    ]
    ds = with_rename_mutants(_files(rows))
    tbl = pa.table(ds.to_pandas())
    ids = tbl["doc_id"].to_pylist()
    # mutants exist for all residue-matching docs
    assert sorted(i for i in ids if i >= RENAME_OFFSET) == [
        RENAME_OFFSET + RENAME_RESIDUE,
        RENAME_OFFSET + RENAME_RESIDUE + RENAME_EVERY,
        RENAME_OFFSET + RENAME_RESIDUE + 2 * RENAME_EVERY,
    ]
    by_id = dict(zip(ids, tbl["content"].to_pylist()))
    src = by_id[RENAME_RESIDUE]
    mut = by_id[RENAME_OFFSET + RENAME_RESIDUE]
    assert src != mut  # byte-distinct
    norm = normalize_code_arrow(pa.array([src, mut])).to_pylist()
    assert norm[0] != norm[1]  # normalization-distinct too

    out = type2_clone_members(ds, id_cols=("doc_id",)).to_pandas()
    groups = {tuple(sorted(g)) for g in out.groupby("p_sha256")["doc_id"].apply(list)}
    assert (RENAME_RESIDUE, RENAME_OFFSET + RENAME_RESIDUE) in groups
    assert (
        RENAME_RESIDUE + 2 * RENAME_EVERY,
        RENAME_OFFSET + RENAME_RESIDUE + 2 * RENAME_EVERY,
    ) in groups
