"""Per-group top-k (K1 cap as a query) — planted truth + tie rules."""

from __future__ import annotations

import pyarrow as pa


def test_top_docs_per_group_planted(ray_session):
    import ray.data

    from europa_ray.pipelines.topk import top_docs_per_group

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "lang": ["py", "py", "py", "go", "go", "py"],
            "content": [
                "a b c",        # 3 tokens
                "a b c d e",    # 5
                "a",            # 1
                "x y",          # 2
                "",             # empty → excluded
                "a b c",        # 3 tokens, ties doc 1 → doc 1 ranks first
            ],
        }
    )
    out = (
        top_docs_per_group(ray.data.from_arrow(t), k=2)
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    rows = [tuple(r) for r in out[["lang", "rank", "doc_id", "n_tokens"]].values]
    assert rows == [
        ("go", 1, 4, 2),
        ("py", 1, 2, 5),
        ("py", 2, 1, 3),   # tie between docs 1 and 6 at 3 tokens → min id
    ]


def test_top_docs_partial_combiner_correct_across_batches(ray_session):
    """The per-batch partial keeps k rows per group per batch; the final
    merge must still produce the GLOBAL top-k when the winners are spread
    over many blocks."""
    import ray.data

    from europa_ray.pipelines.topk import top_docs_per_group

    n = 500
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "lang": ["py"] * n,
            "content": [" ".join(["w"] * (1 + (i * 37) % 101)) for i in range(n)],
        }
    )
    ds = ray.data.from_arrow(t).repartition(16)
    out = top_docs_per_group(ds, k=3).to_pandas().sort_values("rank")
    lens = [(1 + (i * 37) % 101, i) for i in range(n)]
    want = sorted(lens, key=lambda x: (-x[0], x[1]))[:3]
    got = list(zip(out.n_tokens, out.doc_id))
    assert got == want
