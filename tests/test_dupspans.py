"""ExactSubstr duplicated-span statistics: planted truth on a hand-built
corpus and forced-distributed-path equivalence (SQL parity lives in
tests/test_entry.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.pipelines.dupspans import dup_span_stats


def _mk(docs: dict[int, str]) -> "ray.data.Dataset":  # noqa: F821
    import ray.data

    ids = sorted(docs)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "content": pa.array([docs[d] for d in ids], pa.string()),
            }
        )
    )


def _words(tag: str, n: int) -> list[str]:
    return [f"{tag}{i}" for i in range(n)]


def test_planted_spans_first_doc_wins(ray_session):
    """doc 1 and doc 2 share a verbatim 30-token block; doc 1 is the first
    occurrence so only doc 2 carries duplicated positions, covering exactly
    the block (30 - w + 1 positions, 30 tokens)."""
    w = 16
    block = _words("b", 30)
    d1 = " ".join(_words("x", 20) + block)
    d2 = " ".join(block + _words("y", 20))
    d3 = " ".join(_words("z", 40))
    got = dup_span_stats(_mk({1: d1, 2: d2, 3: d3}), w=w).to_pandas()
    assert set(got.doc_id) == {2}
    row = got.iloc[0]
    assert row.dup_positions == 30 - w + 1
    assert row.covered_tokens == 30


def test_within_doc_repeats_count(ray_session):
    """A block repeated INSIDE one doc: the second occurrence's positions
    are duplicated (first occurrence wins within the doc too)."""
    w = 16
    block = _words("r", 20)
    doc = " ".join(block + _words("m", 10) + block)
    got = dup_span_stats(_mk({7: doc}), w=w).to_pandas()
    assert set(got.doc_id) == {7}
    assert got.iloc[0].dup_positions == 20 - w + 1
    assert got.iloc[0].covered_tokens == 20


def test_no_dups_empty_result(ray_session):
    got = dup_span_stats(
        _mk({1: " ".join(_words("a", 40)), 2: " ".join(_words("c", 40))})
    ).to_pandas()
    assert len(got) == 0


def test_forced_join_path_equivalent(ray_session):
    """broadcast_max_grams=0 forces the distributed hash-join path — same
    result as the broadcast path on a corpus with cross- and within-doc
    duplication."""
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(50)]
    docs = {}
    for d in range(12):
        docs[d] = " ".join(rng.choice(vocab, 60))
    shared = _words("s", 25)
    docs[20] = " ".join(_words("p", 5) + shared)
    docs[21] = " ".join(shared + _words("q", 5))
    a = dup_span_stats(_mk(docs)).to_pandas()
    b = dup_span_stats(_mk(docs), broadcast_max_grams=0).to_pandas()
    key = lambda df: sorted(
        zip(df.doc_id, df.dup_positions, df.covered_tokens)
    )
    assert key(a) == key(b)
    assert 21 in set(a.doc_id)
