"""Sequence-packing plan (pipelines/packing.py): brute-force parity on both
paths, order invariance, boundary semantics."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from europa_ray.pipelines.packing import packing_plan


def _mk_files(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, n)]
    words = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
    texts = [
        " ".join(words[rng.integers(0, len(words), int(rng.integers(1, 40)))])
        for _ in range(n)
    ]
    texts[0] = ""
    texts[1] = None
    texts[3] = texts[2]  # exact dup pair: same hash, id breaks the tie
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs.tolist(), pa.string()),
            "content": pa.array(texts, pa.string()),
        }
    )


def _bruteforce(t: pa.Table, seq_len: int) -> list[tuple]:
    from europa_ray.functions.text import tokenize

    rows = []
    for d, lang, txt in zip(
        t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["content"].to_pylist()
    ):
        if not txt:
            continue
        _, off = tokenize([txt])
        u = int(hashlib.sha256(txt.encode()).hexdigest()[:16], 16)
        rows.append((u, d, lang, int(off[1] - off[0])))
    rows.sort()
    out, cum = [], 0
    for u, d, lang, n in rows:
        out.append((d, lang, n, cum, cum // seq_len))
        cum += n
    return sorted(out)


@pytest.mark.parametrize("budget", [None, 0])
@pytest.mark.parametrize("seq_len", [64, 2048])
def test_packing_plan_matches_bruteforce(ray_session, budget, seq_len):
    import ray.data

    t = _mk_files(300)
    kw = {} if budget is None else {"driver_max_keys": budget}
    got = packing_plan(ray.data.from_arrow(t), seq_len=seq_len, **kw).to_pandas()
    got_rows = sorted(
        zip(got.doc_id, got.lang, got.n_tokens, got.start_tok, got.seq_id)
    )
    assert got_rows == _bruteforce(t, seq_len)


def test_packing_plan_is_gapless_and_contiguous(ray_session):
    """Offsets tile the token stream exactly: sorted by start_tok, each doc
    begins where the previous ends, starting at 0."""
    import ray.data

    t = _mk_files(200, seed=3)
    got = (
        packing_plan(ray.data.from_arrow(t), seq_len=128)
        .to_pandas()
        .sort_values("start_tok")
        .reset_index(drop=True)
    )
    assert got.start_tok[0] == 0
    ends = got.start_tok.to_numpy() + got.n_tokens.to_numpy()
    assert (got.start_tok.to_numpy()[1:] == ends[:-1]).all()
    assert (got.seq_id.to_numpy() == got.start_tok.to_numpy() // 128).all()


@pytest.mark.parametrize("budget", [None, 0])
def test_packing_plan_order_invariant(ray_session, budget):
    """The plan is a function of content+id, not input row order."""
    import ray.data

    t = _mk_files(150, seed=5)
    idx = np.random.default_rng(0).permutation(150)
    perm = pa.table({c: t[c].take(pa.array(idx)) for c in t.column_names})
    kw = {} if budget is None else {"driver_max_keys": budget}
    a = packing_plan(ray.data.from_arrow(t), seq_len=64, **kw).to_pandas()
    b = packing_plan(ray.data.from_arrow(perm), seq_len=64, **kw).to_pandas()
    key = lambda df: sorted(zip(df.doc_id, df.start_tok, df.seq_id))
    assert key(a) == key(b)


def test_packing_plan_empty_and_validation(ray_session):
    import ray.data

    t = pa.table(
        {"doc_id": [1, 2], "lang": ["en", "en"], "content": ["", None]}
    )
    got = packing_plan(ray.data.from_arrow(t), seq_len=8).to_pandas()
    assert len(got) == 0
    with pytest.raises(ValueError):
        packing_plan(ray.data.from_arrow(t), seq_len=0)
