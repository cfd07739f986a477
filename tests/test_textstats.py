"""Text-analysis operator tests vs DuckDB oracles (token counts, quality
ppm, lang-id sanity, fingerprint properties)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
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


LABELED_SAMPLE = [
    # natural-language sentences (public-domain phrasing), 3 per language —
    # the synthetic documents.text shares one vocabulary across its lang
    # labels, so THIS is the lang-id accuracy sample (documented in
    # pipelines/textstats.py)
    ("en", "the house is on the hill and it was not far from the river"),
    ("en", "this is the book that he was reading at the time"),
    ("en", "they are coming to the city for the winter with friends"),
    ("de", "der Hund ist nicht mit der Katze in dem Haus und auch nicht im Garten"),
    ("de", "die Kinder werden von dem Lehrer zu der Schule gebracht"),
    ("de", "das ist ein gutes Buch und es ist auch nicht zu teuer"),
    ("fr", "le chat est dans la maison et il ne veut pas sortir pour le moment"),
    ("fr", "les enfants vont plus souvent au parc qui se trouve sur la colline"),
    ("fr", "c'est une belle journée pour se promener dans les rues du village"),
    ("es", "el perro no está en la casa para que los niños jueguen con su pelota"),
    ("es", "una de las ciudades más bonitas del país se encuentra por el norte"),
    ("es", "no es lo que parece y por eso se lo dije al llegar como siempre"),
    ("it", "il gatto non è per niente contento di stare con il cane nella casa"),
    ("it", "sono anche del parere che una passeggiata non faccia male come sempre"),
    ("it", "che bella giornata per andare al mare con i dei amici di sempre"),
    ("pt", "o cachorro não está em uma casa mas sim com os meninos do bairro"),
    ("pt", "uma das praias mais bonitas do país fica por aqui como se sabe"),
    ("pt", "não é o que parece e por isso se diz que é mais um dos casos"),
    ("nl", "de hond is niet met de kat in het huis en ook niet bij de tuin"),
    ("nl", "het is een mooie dag om met de kinderen naar het park te gaan"),
    ("nl", "er zijn ook mensen die niet van de regen houden maar wel van zon"),
    ("sv", "hunden är inte med katten i huset och inte heller på gården så klart"),
    ("sv", "det är en vacker dag att gå till parken med barnen och så vidare"),
    ("sv", "jag var inte så säker på att det skulle bli ett bra år för oss"),
    ("pl", "pies nie jest w domu z kotem i nie ma go także w ogrodzie bo tak"),
    ("pl", "to jest bardzo dobra książka i nie jest też za droga jak na to"),
    ("pl", "dzieci idą do szkoły przez park bo tak jest po prostu szybciej"),
    ("tr", "köpek evde kedi ile değil ve bahçede de yok ama o çok mutlu bir köpek"),
    ("tr", "bu çok güzel bir kitap ve daha ucuz olarak da bulmak mümkün gibi"),
    ("tr", "ben de senin gibi bir gün en güzel yere gitmek için çok istekliyim"),
]


def test_lang_id_labeled_sample_accuracy(ray_session):
    """Documented accuracy of the lexicon-profile scorer on a labeled
    natural-language sample: must be ≥ 0.9 across 10 languages."""
    import pyarrow as pa

    from europa_ray.pipelines.textstats import lang_id_batch

    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(LABELED_SAMPLE)))),
            "text": pa.array([s for _, s in LABELED_SAMPLE]),
        }
    )
    out = lang_id_batch(t)
    pred = out["lang_pred"].to_pylist()
    truth = [l for l, _ in LABELED_SAMPLE]
    acc = sum(p == t_ for p, t_ in zip(pred, truth)) / len(truth)
    assert acc >= 0.9, f"lang-id accuracy {acc}: {list(zip(truth, pred))}"


def test_text_profile_fused_equals_separate(ray_session, docs):
    """One-pass text_profile_batch == token_count_batch ⋈ quality_ppm_batch
    (the fused stage must not drift from the two oracle-green pipelines)."""
    from europa_ray.pipelines.textstats import (
        quality_ppm_batch,
        text_profile_batch,
        token_count_batch,
    )

    fused = (
        docs.map_batches(text_profile_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tok = docs.map_batches(token_count_batch, batch_format="pyarrow").to_pandas()
    q = docs.map_batches(quality_ppm_batch, batch_format="pyarrow").to_pandas()
    joined = (
        tok[["doc_id", "n_tokens"]]
        .merge(q[["doc_id", "n_chars", "alpha_ppm", "digit_ppm", "ws_ppm"]], on="doc_id")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = ["doc_id", "n_tokens", "n_chars", "alpha_ppm", "digit_ppm", "ws_ppm"]
    assert fused[cols].equals(joined[cols])


NO_STOPWORD_SAMPLE = [
    # content-word-only phrasing: zero (or spurious-fragment-only) lexicon
    # hits, so every row exercises the char-trigram fallback path — these
    # were all classified 'und' before the fallback existed
    ("en", "development information systems require testing, different"
           " languages matter because important"),
    ("de", "Entwicklung zuverlässiger Software erfordert sorgfältige"
           " Prüfung während schwieriger Situationen"),
    ("fr", "développement vérification systèmes importants différents"
           " langages nouveaux pendant toujours"),
    ("es", "desarrollo verificación sistemas importantes diferentes"
           " lenguajes siempre durante también"),
    ("it", "sviluppo verifica sistemi importanti differenti linguaggi"
           " sempre durante situazione perché"),
    ("pt", "desenvolvimento verificação sistemas importantes diferentes"
           " linguagens sempre durante também"),
    ("nl", "ontwikkeling betrouwbare software vereist zorgvuldige"
           " verificatie tijdens moeilijke situaties programmeertalen"),
    ("sv", "utveckling pålitlig programvara kräver noggrann verifiering"
           " språk förändring användning viktig"),
    ("pl", "rozwój niezawodnego oprogramowania wymaga weryfikacji podczas"
           " trudnych sytuacji programowanie języków"),
    ("tr", "güvenilir yazılım geliştirme sırasında doğrulama gerektirir"
           " farklı programlama dilleri önemli"),
]


def test_lang_id_trigram_fallback_accuracy(ray_session):
    """Documented accuracy of the char-trigram fallback on documents with
    no stopword-lexicon hits: must classify ≥ 0.9 of the no-stopword
    sample (these rows were 'und' before the fallback)."""
    import pyarrow as pa

    from europa_ray.pipelines.textstats import lang_id_batch

    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(NO_STOPWORD_SAMPLE)))),
            "text": pa.array([s for _, s in NO_STOPWORD_SAMPLE]),
        }
    )
    out = lang_id_batch(t)
    pred = out["lang_pred"].to_pylist()
    truth = [l for l, _ in NO_STOPWORD_SAMPLE]
    acc = sum(p == t_ for p, t_ in zip(pred, truth)) / len(truth)
    assert acc >= 0.9, f"fallback accuracy {acc}: {list(zip(truth, pred))}"
    assert "und" not in pred, f"fallback left rows unclassified: {pred}"


def test_lang_id_mixed_sample_combined(ray_session):
    """Lexicon and fallback rows batched together must each keep their
    verdicts (the fallback only rewrites rows the lexicon can't speak
    for, and must not disturb confident lexicon rows)."""
    import pyarrow as pa

    from europa_ray.pipelines.textstats import lang_id_batch

    combined = LABELED_SAMPLE + NO_STOPWORD_SAMPLE
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(combined)))),
            "text": pa.array([s for _, s in combined]),
        }
    )
    pred = lang_id_batch(t)["lang_pred"].to_pylist()
    truth = [l for l, _ in combined]
    acc = sum(p == t_ for p, t_ in zip(pred, truth)) / len(truth)
    assert acc >= 0.9, f"combined accuracy {acc}: {list(zip(truth, pred))}"


def test_repetition_stats_hand_computed(ray_session):
    """Gopher repetition signals on a hand-built doc: known line and token
    repetition structure."""
    import pyarrow as pa

    from europa_ray.pipelines.textstats import repetition_batch

    # 4 lines: "aa bb" ×2 (dup), "cc" , "aa bb cc dd" — 8 tokens, 'aa' ×3
    text = "aa bb\ncc\naa bb\naa bb cc dd"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([text, None], pa.string()),
        }
    )
    out = repetition_batch(t)
    assert out["doc_id"].to_pylist() == [1]  # null-content row excluded
    assert out["n_lines"].to_pylist() == [4]
    # 1 duplicate occurrence / 4 lines
    assert out["dup_line_ppm"].to_pylist() == [1_000_000 // 4]
    # dup chars = len("aa bb") = 5; total line chars = 5+2+5+11 = 23
    assert out["dup_line_char_ppm"].to_pylist() == [5 * 1_000_000 // 23]
    # 'aa' and 'bb' appear 3×... tokens: aa bb cc aa bb aa bb cc dd = 9 tokens
    # aa×3 bb×3 cc×2 dd×1 → top=3, n_tokens=9
    assert out["top_token_ppm"].to_pylist() == [3 * 1_000_000 // 9]


def test_repetition_stats_schema_on_empty_and_null(ray_session):
    """All-null and zero-row batches keep the canonical output schema."""
    import pyarrow as pa

    from europa_ray.pipelines.textstats import repetition_batch

    nul = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array([None], pa.string())}
    )
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    names = ["doc_id", "n_lines", "dup_line_ppm", "dup_line_char_ppm", "top_token_ppm"]
    for b in (nul, empty):
        out = repetition_batch(b)
        assert out.num_rows == 0
        assert out.column_names == names


# ------------------------------------------------------------ quality_buckets

def _qb_files(n: int, seed: int = 13):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de"])[rng.integers(0, 2, n)]
    # mixed alpha/digit/space content → a spread of alpha_ppm scores,
    # WITH heavy ties (small alphabet of doc shapes)
    parts = ["abc", "123", "   ", "x9", "zz zz"]
    texts = [
        "".join(np.array(parts)[rng.integers(0, len(parts), int(rng.integers(1, 6)))])
        for _ in range(n)
    ]
    texts[0] = ""
    texts[1] = None
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs.tolist(), pa.string()),
            "content": pa.array(texts, pa.string()),
        }
    )


def _qb_bruteforce(t) -> dict[int, tuple[str, int, str]]:
    import re

    rows = []
    for d, lang, txt in zip(
        t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["content"].to_pylist()
    ):
        if not txt:
            continue
        score = len(re.sub(r"[^A-Za-z]", "", txt)) * 1_000_000 // max(len(txt), 1)
        rows.append((d, lang, score))
    out = {}
    for lang in {r[1] for r in rows}:
        scores = sorted(s for _, l, s in rows if l == lang)
        n = len(scores)
        r1, r2 = (n + 2) // 3, (2 * n + 2) // 3
        cut1, cut2 = scores[r1 - 1], scores[r2 - 1]
        for d, l, s in rows:
            if l != lang:
                continue
            b = "tail" if s <= cut1 else ("middle" if s <= cut2 else "head")
            out[d] = (lang, s, b)
    return out


def test_quality_buckets_match_bruteforce(ray_session):
    import ray.data

    from europa_ray.pipelines.textstats import quality_buckets

    t = _qb_files(400)
    got = quality_buckets(ray.data.from_arrow(t)).to_pandas()
    want = _qb_bruteforce(t)
    assert {
        int(r.doc_id): (r.lang, int(r.score), r.bucket) for r in got.itertuples()
    } == want


def test_quality_buckets_ties_share_bucket_and_order_invariant(ray_session):
    """Equal scores always share a bucket (pure function of (lang, score)),
    and the labeling is independent of input row order."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.textstats import quality_buckets

    t = _qb_files(300, seed=5)
    a = quality_buckets(ray.data.from_arrow(t)).to_pandas()
    per_key = a.groupby(["lang", "score"]).bucket.nunique()
    assert (per_key == 1).all()
    idx = np.random.default_rng(1).permutation(300)
    perm = pa.table({c: t[c].take(pa.array(idx)) for c in t.column_names})
    b = quality_buckets(ray.data.from_arrow(perm)).to_pandas()
    key = lambda df: sorted(zip(df.doc_id, df.lang, df.score, df.bucket))
    assert key(a) == key(b)


def test_quality_buckets_tercile_sizes(ray_session):
    """With all-distinct scores each bucket holds n/3 ± 1 docs."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.textstats import quality_buckets

    n = 90
    # strictly increasing alpha fraction → 90 distinct scores, one lang
    texts = ["a" * i + "1" * (100 - i) for i in range(1, n + 1)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(["en"] * n, pa.string()),
            "content": pa.array(texts, pa.string()),
        }
    )
    got = quality_buckets(ray.data.from_arrow(t)).to_pandas()
    sizes = got.bucket.value_counts().to_dict()
    assert sizes == {"tail": 30, "middle": 30, "head": 30}


# ---------------------------------------------------------------------------
# length_outliers
# ---------------------------------------------------------------------------


def test_length_outliers_matches_bruteforce(ray_session):
    """Skewed lengths: a few extreme docs per language; brute-force Tukey
    fences over exact ceil-rank discrete quartiles."""
    import math

    import ray.data

    from europa_ray.pipelines.textstats import length_outliers

    rng = np.random.default_rng(31)
    langs = np.array(["en", "de"])[rng.integers(0, 2, 300)]
    lens = rng.integers(80, 120, 300)
    lens[:6] = [1, 2, 3, 900, 1000, 1100]  # planted outliers
    texts = ["x" * int(k) for k in lens]
    texts[10] = ""
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "lang": pa.array(langs.tolist(), pa.string()),
            "content": pa.array(texts, pa.string()),
        }
    )

    def disc_q(vals, q):
        vals = sorted(vals)
        return vals[math.ceil(q * len(vals)) - 1]

    want = set()
    for lang in ("en", "de"):
        rows = [
            (d, len(x))
            for d, l, x in zip(range(300), langs, texts)
            if l == lang and x
        ]
        ns = [n for _, n in rows]
        q1, q3 = disc_q(ns, 0.25), disc_q(ns, 0.75)
        iqr = q3 - q1
        for d, n in rows:
            if 2 * n < 2 * q1 - 3 * iqr:
                want.add((d, lang, n, "short"))
            elif 2 * n > 2 * q3 + 3 * iqr:
                want.add((d, lang, n, "long"))
    assert want  # the planted rows must actually be outliers

    got = length_outliers(ray.data.from_arrow(t).repartition(4)).to_pandas()
    rows = set(zip(got.doc_id, got.lang, got.n_chars, got.side))
    assert rows == want
