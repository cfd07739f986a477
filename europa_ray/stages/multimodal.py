"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The decode step itself is STUBBED (image/audio codecs are not available in
this environment — mirrors Europa's pluggable decoder chain,
``/root/reference/Api/Implementations/SimilarImages/ImageProcessors/
MagicScalerImageProcessor.cs:50-98``): ``DecodeStub`` either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
decode so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested end-to-end.

Real deployments subclass :class:`MediaFeatureStage` and override
``decode`` with an actual codec; everything else (actor pool lifecycle,
batch flow, error routing to an ``errors`` column instead of exceptions —
the reference's notification side-channel, ``SimilarImageFinder.cs:206-210``)
stays identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.util import hash_strings, splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image|audio|video
        pa.field("payload", pa.binary()),
        pa.field("meta_width", pa.int32()),
        pa.field("meta_height", pa.int32()),
    ]
)


class MediaFeatureStage:
    """Actor-pool stage: decode → feature-extract binary media payloads.

    ``__init__`` loads per-actor state once (the "model load" slot — here a
    deterministic projection matrix standing in for feature weights);
    ``__call__`` processes one Arrow batch. Use with small ``batch_size``
    (large binary payloads) and ``concurrency=(n, m)``.
    """

    FEATURE_DIM = 16

    def __init__(self, *, strict: bool = False, seed: int = 42):
        self.strict = strict
        rng = np.random.default_rng(seed)
        self.weights = rng.standard_normal((64, self.FEATURE_DIM))

    # --- the stub boundary -------------------------------------------------
    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        """Decode payload → fixed 64-dim raw representation.

        STUB: no codecs in this container. strict mode raises (the behavior
        a deployment overrides); default mode derives a deterministic fake
        "decode" from the payload bytes so downstream plumbing is testable.
        """
        if self.strict:
            raise NotImplementedError(
                "media codecs unavailable in this environment; override decode()"
            )
        h = np.frombuffer(payload[:512].ljust(512, b"\0"), dtype=np.uint64)
        return (splitmix64(h)[:64].astype(np.float64) / 2**64).reshape(-1)[:64]

    # -----------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(ids), self.FEATURE_DIM), dtype=np.float64)
        errors: list[str | None] = [None] * len(ids)
        for i, (p, kind) in enumerate(zip(payloads, kinds)):
            try:
                raw = self.decode(p or b"", kind)
                vec = np.zeros(64)
                vec[: raw.shape[0]] = raw[:64]
                feats[i] = vec @ self.weights
            except Exception as e:  # error → data, not exception
                errors[i] = f"{type(e).__name__}: {e}"
        return pa.table(
            {
                "media_id": pa.array(ids),
                "kind": pa.array(kinds, pa.string()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel()), self.FEATURE_DIM
                ),
                "error": pa.array(errors, pa.string()),
            }
        )


def documents_as_media(batch: pa.Table) -> pa.Table:
    """Adapter: treat document text bytes as opaque media payloads (the
    sandbox stand-in for real image/audio columns)."""
    texts = batch["text"].to_pylist()
    payloads = [t.encode("utf-8") if t else b"" for t in texts]
    n = len(texts)
    return pa.table(
        {
            "media_id": batch["doc_id"],
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(np.full(n, 64, dtype=np.int32)),
            "meta_height": pa.array(np.full(n, 64, dtype=np.int32)),
        }
    )


def media_features(ds, *, strict: bool = False, concurrency=2, batch_size: int = 64):
    """Attach the media feature actor-pool stage (small batches: payloads
    are the wide column here)."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"strict": strict},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# REAL audio decode: RIFF/WAVE via stdlib ``wave`` (the one codec available
# in this container — round-5 codec recheck found PIL/cv2/soundfile/librosa/
# av all absent, ``wave`` present). This upgrades the audio half of the
# decode boundary from stub to real: payloads are genuine WAV containers,
# the stage parses the RIFF header and PCM frames with the actual codec,
# and the oracle checks the decoded frame counts round-trip.
#
# Reference parity: Europa's audio path (SURVEY M9,
# /root/reference/Api/Implementations/SimilarAudios/) fingerprints decoded
# PCM; the fingerprint here is the same shape (windowed spectral-band
# signature) over the stdlib-decoded stream.
# --------------------------------------------------------------------------

_WAV_RATE = 8000  # Hz; synthesis + decode both use 8 kHz 16-bit mono PCM


def _synth_wav(data: bytes, rate: int = _WAV_RATE) -> bytes:
    """Deterministic real WAV container: 1 byte of input → 1 PCM sample
    ``(b − 128) << 8`` (16-bit mono). Sample count therefore equals the
    UTF-8 byte length of the source text — the SQL-checkable invariant the
    ``audio_wav_stats`` oracle relies on."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - np.int16(128)
        ) * np.int16(256)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL decode: parse the RIFF/WAVE container with stdlib ``wave`` and
    return ``(sample_rate, int16 PCM array)``. Raises on malformed input
    (routed to the ``error`` column by the stage, never an exception)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError(
                f"expected 16-bit mono, got width={w.getsampwidth()} "
                f"channels={w.getnchannels()}"
            )
        rate = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return rate, pcm


_FP_WINDOW = 256  # samples per fingerprint window
_FP_BANDS = 16  # spectral bands → bits per window


def wav_fingerprint(pcm: np.ndarray) -> np.ndarray:
    """Windowed spectral-band fingerprint (Haitsma–Kalker HAS'02 shape):
    non-overlapping windows of ``_FP_WINDOW`` samples → rFFT → 16 band
    energies → 1 bit per band (energy above the window median). Returns a
    uint16 array, one element per window. Robust to small edits: a changed
    byte flips bits only in its own window, so similarity = fraction of
    equal windows."""
    n = (pcm.shape[0] // _FP_WINDOW) * _FP_WINDOW
    if n == 0:
        return np.zeros(0, dtype=np.uint16)
    frames = pcm[:n].astype(np.float64).reshape(-1, _FP_WINDOW)
    spec = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    bands = spec[:, : (spec.shape[1] // _FP_BANDS) * _FP_BANDS]
    energy = bands.reshape(frames.shape[0], _FP_BANDS, -1).sum(axis=2)
    bits = energy > np.median(energy, axis=1, keepdims=True)
    return (bits << np.arange(_FP_BANDS, dtype=np.uint16)).sum(
        axis=1, dtype=np.uint16
    )


def documents_as_wav(batch: pa.Table) -> pa.Table:
    """Adapter: synthesize a REAL WAV payload per document (UTF-8 bytes →
    PCM). The codec-boundary stand-in for reading an audio column."""
    texts = batch["text"].to_pylist()
    payloads = [_synth_wav((t or "").encode("utf-8")) for t in texts]
    return pa.table(
        {
            "media_id": batch["doc_id"],
            "lang": batch["lang"],
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class WavStatsStage:
    """Actor-pool stage: REAL stdlib-``wave`` decode → per-row PCM stats +
    spectral fingerprint summary. Same lifecycle contract as
    :class:`MediaFeatureStage` (state in ``__init__``, Arrow batch in/out,
    errors as data); the decode itself is a real codec, not a stub."""

    def __init__(self) -> None:
        # per-actor constant state (window index vector for the fingerprint)
        self._bit_weights = np.arange(_FP_BANDS, dtype=np.uint16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        langs = batch["lang"].to_pylist()
        payloads = batch["payload"].to_pylist()
        n = len(ids)
        n_samples = np.zeros(n, dtype=np.int64)
        rates = np.zeros(n, dtype=np.int64)
        peaks = np.zeros(n, dtype=np.int64)
        n_windows = np.zeros(n, dtype=np.int64)
        errors: list[str | None] = [None] * n
        for i, p in enumerate(payloads):
            try:
                rate, pcm = _decode_wav(p or b"")
                rates[i] = rate
                n_samples[i] = pcm.shape[0]
                peaks[i] = int(np.abs(pcm.astype(np.int64)).max()) if pcm.size else 0
                n_windows[i] = wav_fingerprint(pcm).shape[0]
            except Exception as e:  # error → data, not exception
                errors[i] = f"{type(e).__name__}: {e}"
        duration_us = n_samples * 1_000_000 // np.maximum(rates, 1)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "lang": pa.array(langs, pa.string()),
                "n_samples": pa.array(n_samples),
                "sample_rate": pa.array(rates),
                "duration_us": pa.array(duration_us),
                "peak": pa.array(peaks),
                "n_windows": pa.array(n_windows),
                "error": pa.array(errors, pa.string()),
            }
        )


def wav_stats(ds, *, concurrency=2, batch_size: int = 128):
    """documents → real-WAV synthesis → actor-pool decode/stat stage."""
    media = ds.map_batches(documents_as_wav, batch_format="pyarrow")
    return media.map_batches(
        WavStatsStage,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
