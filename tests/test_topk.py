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


def test_eval_sample_per_group(ray_session):
    """Bottom-k-by-hash eval sample vs an independent hashlib truth, incl.
    stability under corpus growth (adding a larger-hash doc changes
    nothing) and duplicate-content id tie-break."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.topk import eval_sample_per_group

    texts = [f"document body {i}" for i in range(20)] + ["document body 0"]
    langs = ["en" if i % 2 == 0 else "de" for i in range(len(texts))]
    ids = list(range(len(texts)))

    def brute(texts, langs, ids, k=3):
        rows = [
            (l, hashlib.sha256(t.encode()).hexdigest()[:16], i)
            for t, l, i in zip(texts, langs, ids)
        ]
        out = {}
        for lang in set(langs):
            sel = sorted((h, i) for (l, h, i) in rows if l == lang)[:k]
            out[lang] = [(r + 1, i, h) for r, (h, i) in enumerate(sel)]
        return out

    want = brute(texts, langs, ids)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "content": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)
    got = eval_sample_per_group(ds, k=3).to_pandas()
    for lang, rows in want.items():
        sub = got[got.lang == lang].sort_values("rank")
        assert list(zip(sub["rank"], sub.doc_id, sub.h)) == rows

    # non-default group_col: the output group column is named after it
    ds2 = ds.map_batches(
        lambda b: b.rename_columns(
            [{"lang": "corpus"}.get(c, c) for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    got2 = eval_sample_per_group(ds2, group_col="corpus", k=3).to_pandas()
    assert "corpus" in got2.columns and "lang" not in got2.columns
    for lang, rows in want.items():
        sub = got2[got2.corpus == lang].sort_values("rank")
        assert list(zip(sub["rank"], sub.doc_id, sub.h)) == rows
