"""REAL-codec audio path: stdlib ``wave`` RIFF synthesis/decode roundtrip,
spectral fingerprint locality, error routing, and the oracle invariant
(decoded n_samples ≡ UTF-8 byte length) end-to-end through the actor-pool
stage. This is the one decode boundary in the engine backed by an actual
codec (round-5 recheck: PIL/cv2/soundfile/librosa/av absent, ``wave``
present — see BASELINE.md)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from europa_ray.stages.multimodal import (
    WavStatsStage,
    _decode_wav,
    _synth_wav,
    documents_as_wav,
    wav_fingerprint,
    wav_stats,
)


def test_synth_decode_roundtrip_exact():
    data = "héllo wörld — the wav codec must round-trip exactly".encode()
    rate, pcm = _decode_wav(_synth_wav(data))
    assert rate == 8000
    assert pcm.shape[0] == len(data)
    want = (np.frombuffer(data, np.uint8).astype(np.int16) - 128) * 256
    assert (pcm == want).all()


def test_decode_is_a_real_container_parse():
    """The payload is a genuine RIFF/WAVE file: stdlib ``wave`` must accept
    it, and corrupting the container header must be rejected — i.e. the
    stage is parsing the format, not slicing bytes."""
    w = _synth_wav(b"abcdef")
    assert w[:4] == b"RIFF" and w[8:12] == b"WAVE"
    with pytest.raises(Exception):
        _decode_wav(b"JUNK" + w[4:])


def test_empty_payload_decodes_to_zero_samples():
    rate, pcm = _decode_wav(_synth_wav(b""))
    assert rate == 8000 and pcm.shape[0] == 0
    assert wav_fingerprint(pcm).shape == (0,)


def test_fingerprint_edit_locality():
    base = b"the quick brown fox jumps over the lazy dog " * 40
    fp1 = wav_fingerprint(_decode_wav(_synth_wav(base))[1])
    mut = bytearray(base)
    for i in range(640, 704):  # a 64-byte edit inside window 2 (512..767)
        mut[i] ^= 0xFF
    fp2 = wav_fingerprint(_decode_wav(_synth_wav(bytes(mut)))[1])
    assert fp1.shape == fp2.shape and fp1.shape[0] == len(base) // 256
    diff = np.nonzero(fp1 != fp2)[0]
    assert list(diff) == [2]  # the edit flips ONLY its own window


def test_stage_error_routing_not_exception():
    """Malformed payloads become ``error`` rows (the reference's
    notification side-channel, SimilarImageFinder.cs:206-210), never a
    raised exception."""
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["en", "en"], pa.string()),
            "payload": pa.array([_synth_wav(b"ok"), b"not a wav"], pa.binary()),
        }
    )
    out = WavStatsStage()(batch)
    errs = out["error"].to_pylist()
    assert errs[0] is None and errs[1] is not None
    assert out["n_samples"].to_pylist() == [2, 0]


def test_wav_stats_dataset_matches_byte_lengths(ray_session):
    import ray.data

    texts = ["alpha beta", "γδε", "", None, "x" * 300]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "lang": pa.array(["en", "el", "en", "en", "en"], pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = wav_stats(docs).to_pandas().sort_values("media_id")
    want = [len((t or "").encode()) for t in texts]
    assert out["n_samples"].tolist() == want
    assert (out["sample_rate"] == 8000).all()
    assert out["duration_us"].tolist() == [n * 125 for n in want]
    assert out["error"].isna().all()


def test_documents_as_wav_schema():
    batch = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "lang": pa.array(["en"], pa.string()),
            "text": pa.array(["hello"], pa.string()),
        }
    )
    media = documents_as_wav(batch)
    assert media.column_names == ["media_id", "lang", "payload"]
    rate, pcm = _decode_wav(media["payload"][0].as_py())
    assert pcm.shape[0] == 5
