"""ExactSubstr duplicated-span statistics: planted truth on a hand-built
corpus and forced-distributed-path equivalence (SQL parity lives in
tests/test_entry.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

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


# ---- ExactSubstr span REMOVAL (dedup_spans_rewrite) ----


def _rewrite_corpus():
    import pyarrow as pa

    block = " ".join(f"b{i}" for i in range(20))
    return pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "lang": ["en"] * 4,
            "content": [
                "u1 u2 u3 " + block + " u4 u5",  # first occurrence → intact
                "v1 v2 " + block + " v3",        # block removed
                "w1 w2 w3",                       # short, untouched
                "",                               # empty → excluded
            ],
        }
    )


def test_rewrite_planted_truth(ray_session):
    import hashlib

    import ray.data

    from europa_ray.pipelines.dupspans import dedup_spans_rewrite

    t = _rewrite_corpus()
    out = (
        dedup_spans_rewrite(ray.data.from_arrow(t), w=16)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    sha = lambda s: hashlib.sha256(s.encode()).hexdigest()
    assert out.loc[1].removed_tokens == 0
    assert out.loc[1].rewritten_sha256 == sha(t["content"][0].as_py())
    assert out.loc[2].removed_tokens == 20
    assert out.loc[2].rewritten_sha256 == sha("v1 v2 v3")
    assert out.loc[3].removed_tokens == 0
    assert 4 not in out.index  # empty content excluded


def test_rewrite_distributed_path_equivalence(ray_session):
    import pandas as pd
    import ray.data

    from europa_ray.pipelines.dupspans import dedup_spans_rewrite

    t = _rewrite_corpus()
    a = (
        dedup_spans_rewrite(ray.data.from_arrow(t), w=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dedup_spans_rewrite(ray.data.from_arrow(t), w=16, broadcast_max_grams=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_rewrite_removed_equals_stats_coverage(ray_session):
    """removed_tokens must equal dup_span_stats' covered_tokens for every
    doc the stats op reports (same grams, same first-wins rule, same
    interval union)."""
    import ray.data

    from europa_ray.pipelines.dupspans import dedup_spans_rewrite, dup_span_stats

    t = _rewrite_corpus()
    stats = dup_span_stats(ray.data.from_arrow(t), w=16).to_pandas().set_index("doc_id")
    rew = (
        dedup_spans_rewrite(ray.data.from_arrow(t), w=16)
        .to_pandas().set_index("doc_id")
    )
    for d, row in stats.iterrows():
        assert rew.loc[d].removed_tokens == row.covered_tokens
    for d, row in rew.iterrows():
        if d not in stats.index:
            assert row.removed_tokens == 0


def test_rewrite_fully_duplicated_doc(ray_session):
    """An exact copy of an earlier doc rewrites to the empty string (every
    position covered), hashed as sha256('')."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.dupspans import dedup_spans_rewrite

    text = " ".join(f"t{i}" for i in range(30))
    t = pa.table(
        {"doc_id": [1, 2], "lang": ["en"] * 2, "content": [text, text]}
    )
    out = (
        dedup_spans_rewrite(ray.data.from_arrow(t), w=16)
        .to_pandas().set_index("doc_id")
    )
    assert out.loc[1].removed_tokens == 0
    assert out.loc[2].kept_tokens == 0
    assert out.loc[2].rewritten_sha256 == hashlib.sha256(b"").hexdigest()


def test_rewrite_canonicalizes_whitespace(ray_session):
    """Docs without any duplicated span still come out whitespace-canonical
    (tokens joined by single spaces) — the documented normalization."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.dupspans import dedup_spans_rewrite

    t = pa.table(
        {"doc_id": [1], "lang": ["en"], "content": ["a   b\t\tc\nd, e!"]}
    )
    out = dedup_spans_rewrite(ray.data.from_arrow(t), w=16).to_pandas()
    want = "a b c d , e !"  # punct are single tokens under \w+|[^\w\s]
    assert out.iloc[0].rewritten_sha256 == hashlib.sha256(want.encode()).hexdigest()


def test_token_spans_invalid_utf8_passthrough():
    """Raw byte rows that do not decode as UTF-8 are flagged passthrough
    with zero tokens (Arrow string columns are always valid UTF-8, so this
    guards future binary-content adapters, not the Dataset path)."""
    import numpy as np

    from europa_ray.functions.text import token_spans

    good = b"ok tokens here"
    bad = b"ok \xff\xfe raw"
    data = np.frombuffer(good + bad, dtype=np.uint8)
    roff = np.array([0, len(good), len(good) + len(bad)], dtype=np.int64)
    s, e, off, pt = token_spans(data, roff)
    assert not pt[0] and pt[1]
    assert off[1] - off[0] == 3  # ok / tokens / here
    assert off[2] == off[1]      # passthrough row contributes no tokens


@pytest.mark.parametrize("budget", [5_000_000, 0])
def test_span_key_safe_for_arbitrary_int64_ids(ray_session, budget):
    """Regression: the old doc_id·2^32+pos int64 packing overflowed for
    ids ≥ 2^31 (hash row_ids are arbitrary int64) and the distributed
    decode then scattered coverage onto wrong docs. Both paths must
    agree — and match the planted truth — for extreme ids."""
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.dupspans import dedup_spans_rewrite, dup_span_stats

    block = " ".join(f"b{i}" for i in range(20))
    big = 9_000_000_000_000_000_000
    t = pa.table(
        {
            "doc_id": [-big, big, 3],
            "lang": ["en"] * 3,
            "content": [
                "u1 u2 " + block,          # min key (most negative id) wins
                "v1 v2 " + block + " v3",  # block removed
                "w1 w2 w3",
            ],
        }
    )
    stats = (
        dup_span_stats(ray.data.from_arrow(t), w=16, broadcast_max_grams=budget)
        .to_pandas().set_index("doc_id")
    )
    assert list(stats.index) == [big]
    assert stats.loc[big].covered_tokens == 20
    rew = (
        dedup_spans_rewrite(
            ray.data.from_arrow(t), w=16, broadcast_max_grams=budget
        ).to_pandas().set_index("doc_id").sort_index()
    )
    assert rew.loc[-big].removed_tokens == 0
    assert rew.loc[big].removed_tokens == 20
    assert rew.loc[3].removed_tokens == 0


def test_rewrite_permutation_invariance(ray_session):
    """First-occurrence-wins is keyed on (id, pos), not input order:
    shuffling the input rows must leave the rewrite byte-identical."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.dupspans import dedup_spans_rewrite

    block = " ".join(f"b{i}" for i in range(20))
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "lang": ["en"] * 4,
            "content": [
                "u1 u2 " + block,
                "v1 " + block + " v2",
                block + " w1",
                "x1 x2 x3",
            ],
        }
    )
    perm = pa.table({c: t[c].take(pa.array([3, 1, 0, 2])) for c in t.column_names})
    a = (
        dedup_spans_rewrite(ray.data.from_arrow(t), w=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dedup_spans_rewrite(ray.data.from_arrow(perm), w=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
