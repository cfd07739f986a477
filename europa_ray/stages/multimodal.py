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
