"""Split-leakage audit (pipelines/leakage.py) — independent hashlib/re
brute-force truth on both dispatch paths."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pyarrow as pa
import pytest
import ray.data

FRACTIONS = (("train", 0.5), ("test", 0.5))


def _brute(texts: list[str | None]) -> dict[tuple[str, str], int]:
    thr = int(0.5 * (1 << 64))
    groups: dict[str, set[str]] = defaultdict(set)
    for t in texts:
        if not t:
            continue
        u = int(hashlib.sha256(t.encode()).hexdigest()[:16], 16)
        split = "train" if u < thr else "test"
        n = re.sub(r"(//|#)[^\n]*", "", t)
        n = re.sub(r"[ \t\r\n]+", " ", n.lower()).strip(" ")
        if not n:
            continue
        groups[hashlib.sha256(n.encode()).hexdigest()].add(split)
    out: dict[tuple[str, str], int] = defaultdict(int)
    for splits in groups.values():
        ss = sorted(splits)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                out[(ss[i], ss[j])] += 1
    return dict(out)


def _corpus() -> list[str | None]:
    texts: list[str | None] = []
    for i in range(40):
        base = f"alpha beta gamma delta epsilon {i}"
        texts.append(base)
        # formatting-only variant: different raw hash, same norm digest —
        # straddles the split whenever the two u64 keys fall apart
        texts.append(f"# comment {i}\n" + base.upper().replace(" ", "   "))
    texts += ["", None, "# only a comment", "   \n\t"]
    return texts


@pytest.mark.parametrize("budget", [50_000_000, 0])
def test_split_leakage_matches_brute_force(ray_session, budget):
    from europa_ray.pipelines.leakage import split_leakage

    texts = _corpus()
    expect = _brute(texts)
    assert expect, "fixture must plant at least one leak"
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "content": pa.array(texts, pa.string()),
        }
    )
    got = split_leakage(
        ray.data.from_arrow(t).repartition(4),
        fractions=FRACTIONS,
        driver_max_rows=budget,
    )
    got_d = {
        (r["split_a"], r["split_b"]): r["n_groups"] for r in got.to_pylist()
    }
    assert got_d == expect


def test_split_leakage_no_leaks(ray_session):
    """Unique contents → every norm group has one member → empty output."""
    from europa_ray.pipelines.leakage import split_leakage

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "content": pa.array(["aaa", "bbb", "ccc"], pa.string()),
        }
    )
    got = split_leakage(ray.data.from_arrow(t), fractions=FRACTIONS)
    assert got.num_rows == 0
    assert got.schema.names == ["split_a", "split_b", "n_groups"]
