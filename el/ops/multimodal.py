"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / featurized by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): ``strict=True`` raises NotImplementedError exactly
where a real decoder (PIL / torchaudio / pyav) would plug in, and the
default deterministic fake derives pseudo-features from the payload
bytes so the Ray-side plumbing — schema, batch sizing for fat binary
rows, actor signature, output layout — is real and tested end-to-end.

Batch-size note: binary payloads are large; keep ``batch_size`` small
(64-256) so batch x concurrency fits worker heaps, and keep these
stages in batch_format="pyarrow" (binary columns do not round-trip
pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

ASSETS = pa.schema(
    [
        ("asset_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON sidecar (codec, dims, sample rate)
    ]
)


def fake_assets_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic binary fixture (stand-in for real media files)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    payloads = []
    kind_col = []
    for i in range(n):
        k = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payloads.append(rng.bytes(size))
        kind_col.append(k)
    return pa.table(
        {
            "asset_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(['{"codec":"raw"}'] * n, pa.string()),
        }
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic pseudo-decode: dims/duration + a 16-dim feature
    vector derived from the payload digest."""
    d = hashlib.sha256(payload).digest()
    feat = [b / 255.0 for b in d[:16]]
    if kind == "image":
        return {"width": 64 + d[0], "height": 64 + d[1], "frames": 1, "feat": feat}
    if kind == "audio":
        return {"width": 0, "height": 0, "frames": 100 + d[2], "feat": feat}
    return {"width": 64 + d[0], "height": 64 + d[1], "frames": 24 + d[3], "feat": feat}


class AssetFeaturizer:
    """Actor-pool stage: decode + feature-extract binary assets.

    ``strict=True`` marks the real-decoder boundary: it raises
    NotImplementedError (no media libs in this container)."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:  # real decoder would load here, once per actor
            import PIL  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict and not self.has_pil:
            raise NotImplementedError(
                "real media decode requires PIL/libav; not available here"
            )
        widths, heights, frames, feats = [], [], [], []
        for payload, kind in zip(
            t.column("payload").to_pylist(), t.column("kind").to_pylist()
        ):
            d = _fake_decode(payload, kind)
            widths.append(d["width"])
            heights.append(d["height"])
            frames.append(d["frames"])
            feats.append(d["feat"])
        return (
            t.select(["asset_id", "kind"])
            .append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("frames", pa.array(frames, pa.int32()))
            .append_column("feat", pa.array(feats, pa.list_(pa.float64())))
        )


def featurize_assets(assets_ds, concurrency: int = 2, batch_size: int = 128,
                     strict: bool = False):
    """Dataset wrapper: assets -> per-asset features (actor pool, small
    batches for fat binary rows)."""
    return assets_ds.map_batches(
        AssetFeaturizer,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
