"""Bloom digest prefilter (stages/bloom.py) + the bloom-prefiltered
cross-corpus exact dedup scale path: no false negatives, measured FP rate,
and bit-exact equivalence with the plain operator at any filter size."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _shas(n: int, tag: str) -> pa.Array:
    return pa.array(
        [hashlib.sha256(f"{tag}-{i}".encode()).hexdigest() for i in range(n)],
        pa.string(),
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


def _as_table(result) -> pa.Table:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tables = [
            t
            for t in result.iter_batches(batch_format="pyarrow", batch_size=1 << 16)
            if t.num_rows
        ]
        if not tables:
            return result.schema().base_schema.empty_table()
        return pa.concat_tables(tables, promote_options="default")
    return result


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    import ray.data

    from europa_ray.stages.bloom import bloom_probe, build_bloom
    from europa_ray.util import hex_to_u256_arrow

    n = 20_000
    members = _shas(n, "member")
    ds = ray.data.from_arrow(pa.table({"sha256": members})).materialize()
    bitmap, m_bits, k = build_bloom(ds, n, bits_per_key=12)

    hit = bloom_probe(bitmap, hex_to_u256_arrow(members), m_bits, k)
    assert hit.all(), "bloom filters must have zero false negatives"

    probes = _shas(50_000, "outsider")
    fp = bloom_probe(bitmap, hex_to_u256_arrow(probes), m_bits, k)
    rate = fp.mean()
    # theory at 12 bits/key, k=8: ~0.0031; allow generous sampling slack
    assert rate < 0.02, f"false-positive rate {rate:.4f} way above theory"


def test_bloom_pipeline_matches_exact_path(ray_session):
    from europa_ray.pipelines.exact import (
        cross_corpus_new_docs,
        cross_corpus_new_docs_bloom,
    )

    ref = _files([(i, f"shared body {i} lorem ipsum") for i in range(400)])
    new = _files(
        [
            (1000 + i, f"shared body {i} lorem ipsum" if i % 3 == 0 else f"fresh body {i}")
            for i in range(400)
        ]
    )
    want = (
        _as_table(cross_corpus_new_docs(new, ref, id_col="doc_id"))
        .sort_by("doc_id")
    )
    for bpk in (12, 1):  # 1 bit/key ≈ everything collides → all rows verify
        got = _as_table(
            cross_corpus_new_docs_bloom(new, ref, id_col="doc_id", bits_per_key=bpk)
        ).sort_by("doc_id")
        assert got.equals(want), f"bloom path diverged at bits_per_key={bpk}"
    assert want.num_rows == sum(1 for i in range(400) if i % 3 != 0)


def test_bloom_pipeline_edge_cases(ray_session):
    from europa_ray.pipelines.exact import cross_corpus_new_docs_bloom

    new = _files([(1, "only doc")])
    empty = _files([]).filter(lambda r: True)
    out = _as_table(cross_corpus_new_docs_bloom(new, empty, id_col="doc_id"))
    assert out.num_rows == 1  # empty reference: everything is new

    all_dup = _as_table(cross_corpus_new_docs_bloom(new, new, id_col="doc_id"))
    assert all_dup.num_rows == 0  # identical corpora: nothing is new
