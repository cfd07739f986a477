"""Text-analysis operator tests vs DuckDB oracles (token counts, quality
ppm, lang-id sanity, fingerprint properties)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF_TINY}/documents.parquet")


def test_token_counts_match_duckdb(ray_session, docs):
    from europa_ray.pipelines.textstats import token_count_batch

    got = (
        docs.map_batches(token_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
        .to_pandas()
        .sort_values("doc_id")
    )
    want = duckdb.sql(
        rf"""SELECT doc_id, length(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens
             FROM '{SF_TINY}/documents.parquet' ORDER BY doc_id"""
    ).df()
    assert got.n_tokens.tolist() == want.n_tokens.tolist()


def test_quality_ppm_matches_duckdb(ray_session, docs):
    from europa_ray.pipelines.textstats import quality_ppm_batch

    got = (
        docs.map_batches(quality_ppm_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_chars", "alpha_ppm", "digit_ppm", "ws_ppm"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""SELECT doc_id, length(text) AS n_chars,
               (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000000) // greatest(length(text),1) AS alpha_ppm,
               (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1000000) // greatest(length(text),1) AS digit_ppm,
               (length(text) - length(regexp_replace(text, '[ \t\n\r\f\v]', '', 'g'))) * 1000000 // greatest(length(text),1) AS ws_ppm
            FROM '{SF_TINY}/documents.parquet' ORDER BY doc_id"""
    ).df()
    for c in ["n_chars", "alpha_ppm", "digit_ppm", "ws_ppm"]:
        assert got[c].tolist() == want[c].tolist(), c


def test_lang_id_sanity(ray_session, docs):
    """Driver documents are english-ish word salads tagged with various
    langs; the classifier must at least be deterministic and prefer 'en'
    for texts full of english stopwords."""
    from europa_ray.pipelines.textstats import lang_id_batch

    got = docs.map_batches(lang_id_batch, batch_format="pyarrow").to_pandas()
    got2 = docs.map_batches(lang_id_batch, batch_format="pyarrow").to_pandas()
    a = got.sort_values("doc_id").lang_pred.tolist()
    assert a == got2.sort_values("doc_id").lang_pred.tolist()
    import pyarrow as pa

    one = lang_id_batch(
        pa.table({"doc_id": pa.array([1]), "text": pa.array(["the cat and the dog in the house is for a walk"])})
    )
    assert one["lang_pred"][0].as_py() == "en"


def test_fingerprint_properties(ray_session):
    import pyarrow as pa

    from europa_ray.pipelines.textstats import fingerprint_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4]),
            "text": pa.array(
                [
                    "a b c d e",
                    "a b c d e",      # identical → same fp
                    "e d c b a",      # permuted → different fp
                    "a b c d f",      # edited → different fp
                ]
            ),
        }
    )
    out = fingerprint_batch(t)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert fp[0] != fp[3]
