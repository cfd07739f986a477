"""Golden end-to-end near-dup test vs a brute-force all-pairs oracle
(SURVEY.md §5.3): dup-pair recall ≥ 0.99 at the north-rule config."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from europa_ray.functions.text import shingles, tokenize, unique_per_row
from europa_ray.util import hex_to_u64, sha256_hex

TAU = 0.72


@pytest.fixture(scope="module")
def truth_pairs(tiny_corpus):
    """Brute-force: true Jaccard over all distinct-content pairs."""
    tb = pq.read_table(sorted(glob.glob(tiny_corpus + "/*.parquet")))
    texts = tb["content"].to_pylist()
    sha = sha256_hex(texts)
    seen: dict[str, int] = {}
    for i, h in enumerate(sha):
        if h is not None and h not in seen:
            seen[h] = i
    idx = sorted(seen.values())
    th, off = tokenize([texts[i] for i in idx])
    sh_, soff = shingles(th, off, 5)
    ush, uoff = unique_per_row(sh_, soff)
    sets = [set(ush[uoff[i] : uoff[i + 1]].tolist()) for i in range(len(idx))]
    nodes = hex_to_u64([sha[i] for i in idx]).view(np.int64)
    pairs = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            si, sj = sets[i], sets[j]
            if not si or not sj:
                continue
            inter = len(si & sj)
            if not inter:
                continue
            if inter / (len(si) + len(sj) - inter) >= TAU:
                a, b = int(nodes[i]), int(nodes[j])
                pairs.add((min(a, b), max(a, b)))
    return pairs


@pytest.fixture(scope="module")
def pipeline_out(ray_session, tiny_corpus):
    import ray.data

    from europa_ray.pipelines.neardup import near_dup_pipeline

    fds = ray.data.read_parquet(tiny_corpus)
    out = near_dup_pipeline(fds)
    return {
        "pairs": out["pairs"].to_pandas(),
        "clusters": out["clusters"].to_pandas(),
    }


def test_pair_recall_and_precision(pipeline_out, truth_pairs):
    pairs = pipeline_out["pairs"]
    got = set(zip(pairs.a.tolist(), pairs.b.tolist()))
    tp = len(truth_pairs & got)
    assert truth_pairs, "corpus must plant near-dup pairs"
    recall = tp / len(truth_pairs)
    precision = tp / len(got) if got else 1.0
    assert recall >= 0.99, f"pair recall {recall:.4f} < 0.99"
    assert precision >= 0.95, f"pair precision {precision:.4f}"


def test_cluster_dup_pair_recall(pipeline_out, truth_pairs):
    clusters = pipeline_out["clusters"]
    got_cc = dict(zip(clusters.node.tolist(), clusters.cluster_id.tolist()))
    ok = sum(
        1
        for a, b in truth_pairs
        if got_cc.get(a) is not None and got_cc.get(a) == got_cc.get(b)
    )
    recall = ok / len(truth_pairs)
    assert recall >= 0.99, f"cluster dup-pair recall {recall:.4f} < 0.99"


def test_exact_dup_groups_included(pipeline_out, tiny_corpus):
    """Pure exact-dup groups (≥2 identical rows) appear even without LSH
    edges, with cluster == own node (SimilarImageFinder.cs:119 emit rule)."""
    import duckdb

    clusters = pipeline_out["clusters"]
    oracle = duckdb.sql(
        f"""SELECT path FROM parquet_scan('{tiny_corpus}/*.parquet')
            WHERE length(content) > 0
            QUALIFY count(*) OVER (PARTITION BY sha256(content)) > 1"""
    ).df()
    got_paths = set(clusters.path)
    missing = set(oracle.path) - got_paths
    assert not missing, f"{len(missing)} exact-dup members missing from near-dup output"


def test_output_deterministic_sorted(pipeline_out):
    clusters = pipeline_out["clusters"]
    assert clusters.cluster_id.is_monotonic_increasing
    # singleton suppression: every cluster has >= 2 member rows
    sizes = clusters.groupby("cluster_id").size()
    assert (sizes >= 2).all()


def test_permutation_invariance(ray_session, tiny_corpus, pipeline_out):
    """Shuffling input rows leaves the cluster *sets* unchanged (SURVEY §5.4)."""
    import ray.data

    from europa_ray.pipelines.neardup import near_dup_pipeline

    fds = ray.data.read_parquet(tiny_corpus).random_shuffle(seed=7)
    out = near_dup_pipeline(fds)
    shuffled = out["clusters"].to_pandas()
    base = pipeline_out["clusters"]
    key = lambda df: sorted(zip(df.path, df.cluster_id))
    assert key(shuffled) == key(base)


def test_neighbor_sets_driver_distributed_equivalent(ray_session):
    """Forcing driver_max_rows=0 routes neighbor_sets through the groupby
    path; outputs must match the vectorized driver build."""
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.neardup import neighbor_sets

    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 1, 2, 5], pa.int64()),
                "b": pa.array([2, 3, 3, 6], pa.int64()),
                "est": pa.array([0.9, 0.8, 0.85, 1.0], pa.float64()),
                "source": pa.array(["lsh"] * 4, pa.string()),
            }
        )
    )
    d1 = neighbor_sets(pairs).to_pandas().sort_values("node").reset_index(drop=True)
    d2 = (
        neighbor_sets(pairs, driver_max_rows=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert d1.node.tolist() == d2.node.tolist() == [1, 2, 3, 5, 6]
    assert [sorted(x) for x in d1.neighbors] == [sorted(x) for x in d2.neighbors]
    assert d1.n_neighbors.tolist() == d2.n_neighbors.tolist()


def test_perm_mode_recall(ray_session, tiny_corpus, truth_pairs):
    """The classic num_perm-independent-permutations mode (the golden
    fixtures cover the default OPH mode) meets the same recall bar — both
    MinHash families stay release-quality."""
    import ray.data

    from europa_ray.config import EngineConfig
    from europa_ray.pipelines.neardup import near_dup_pipeline

    cfg = EngineConfig(minhash_mode="perm")
    out = near_dup_pipeline(ray.data.read_parquet(tiny_corpus), cfg)
    pairs = out["pairs"].to_pandas()
    got = set(zip(pairs.a.tolist(), pairs.b.tolist()))
    tp = len(truth_pairs & got)
    recall = tp / len(truth_pairs)
    precision = tp / len(got) if got else 1.0
    assert recall >= 0.99, f"perm pair recall {recall:.4f} < 0.99"
    assert precision >= 0.95, f"perm pair precision {precision:.4f}"


def test_near_dup_representatives_both_paths(ray_session):
    """The deduplicated-corpus materialization keeps exactly one canonical
    representative (min (sha256, id)) per cluster plus every unclustered
    row — driver lexsort path and forced-budget-0 distributed path agree
    with the recomputed truth."""
    import ray.data

    from europa_ray.pipelines.neardup import (
        near_dup_pipeline,
        near_dup_representatives,
    )
    from europa_ray.sources.augment import with_mutants
    from europa_ray.sources.files import read_documents_as_files
    from tests.conftest import SF_TINY

    docs = with_mutants(read_documents_as_files(SF_TINY))
    cl = near_dup_pipeline(docs, id_cols=("doc_id",))["clusters"].to_pandas()
    cl = cl.sort_values(["cluster_id", "sha256", "doc_id"])
    reps = cl.groupby("cluster_id").first().doc_id
    drop = set(cl.doc_id) - set(reps)
    assert drop, "mutant corpus must produce droppable duplicates"
    all_ids = set(docs.select_columns(["doc_id"]).to_pandas().doc_id)
    want = all_ids - drop

    a = near_dup_representatives(docs, id_col="doc_id").to_pandas()
    assert set(a.doc_id) == want
    assert list(a.columns) == ["doc_id", "lang"]

    b = near_dup_representatives(
        docs, id_col="doc_id", driver_max_cluster_rows=0
    ).to_pandas()
    assert set(b.doc_id) == want


def test_exact_verify_mode_equals_truth(ray_session, tiny_corpus, truth_pairs):
    """The oracle config (candidates='all' + verify_mode='exact') produces
    EXACTLY the brute-force true-Jaccard pair set — no estimator margin, no
    banding recall gap — while running the full band-explode → pairing →
    dedupe → verify chain (the ≡-by-construction driver-oracle mode)."""
    import ray.data

    from europa_ray.config import EngineConfig
    from europa_ray.pipelines.neardup import near_dup_pipeline

    cfg = EngineConfig(candidates="all", verify_mode="exact")
    out = near_dup_pipeline(ray.data.read_parquet(tiny_corpus), cfg)
    got = out["pairs"].to_pandas()
    assert set(zip(got.a, got.b)) == truth_pairs


def test_exact_verify_lsh_candidates_subset(ray_session, tiny_corpus, truth_pairs):
    """Exact verification over PRODUCTION banded-LSH candidates: every
    emitted pair is a true pair (precision 1.0 by construction) and recall
    stays at the banding level (≥ 0.99 on this corpus)."""
    import ray.data

    from europa_ray.config import EngineConfig
    from europa_ray.pipelines.neardup import near_dup_pipeline

    cfg = EngineConfig(verify_mode="exact")  # candidates stay 'lsh'
    out = near_dup_pipeline(ray.data.read_parquet(tiny_corpus), cfg)
    got = set(zip(*(lambda d: (d.a, d.b))(out["pairs"].to_pandas())))
    assert got <= truth_pairs
    assert len(got) >= 0.99 * len(truth_pairs)


def test_join_assembly_matches_broadcast(ray_session):
    """Forcing cc_driver_max_edges=0 routes through distributed CC labels +
    the join-based member assembly (no driver label dict) — output must be
    identical to the default broadcast assembly."""
    from europa_ray.config import EngineConfig
    from europa_ray.pipelines.neardup import near_dup_pipeline
    from europa_ray.sources.augment import with_mutants
    from europa_ray.sources.files import read_documents_as_files
    from tests.conftest import SF_TINY

    docs = with_mutants(read_documents_as_files(SF_TINY))
    base = near_dup_pipeline(docs, id_cols=("doc_id",))["clusters"].to_pandas()
    forced = near_dup_pipeline(
        docs, EngineConfig(cc_driver_max_edges=0), id_cols=("doc_id",)
    )["clusters"].to_pandas()
    key = lambda df: sorted(zip(df.doc_id, df.sha256, df.cluster_id, df.source))
    assert key(forced) == key(base)
    assert len(base) > 0


def test_near_dup_representatives_tiny_distributed(ray_session):
    """Tiny corpus on the forced-distributed branch — regression for
    zero-column blocks out of the cluster-min groupby, plus the
    all-singleton zero-drop short-circuit."""
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.neardup import near_dup_representatives

    def mk(texts):
        n = len(texts)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "lang": pa.array(["en"] * n, pa.string()),
                    "content": pa.array(texts, pa.string()),
                }
            )
        ).repartition(3)

    dup = mk(["alpha beta gamma delta epsilon zeta"] * 2 + ["unrelated words here now"])
    got = near_dup_representatives(dup, driver_max_cluster_rows=0)
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert len(df) == 2  # one rep per dup pair + the singleton

    uniq = mk(["first unique alpha beta gamma", "second unique delta epsilon zeta"])
    got2 = near_dup_representatives(uniq, driver_max_cluster_rows=0)
    df2 = got2.to_pandas() if isinstance(got2, ray.data.Dataset) else got2.to_pandas()
    assert len(df2) == 2  # all singletons kept
