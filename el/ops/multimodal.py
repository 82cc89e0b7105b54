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

from .textstats import round_half_away

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


class FrameSampler:
    """Actor-pool stage: sample up to ``max_frames`` evenly-strided
    frames per asset and emit ONE ROW PER SAMPLED FRAME — the row
    explosion a video pipeline needs between decode and per-frame
    featurizing. The frame decode itself is the stubbed boundary
    (``strict=True`` raises, as in AssetFeaturizer); the deterministic
    fake derives each frame's 4-dim feature from
    sha256(payload + b":" + frame_idx)."""

    def __init__(self, max_frames: int = 8, strict: bool = False):
        self.max_frames = max_frames
        self.strict = strict
        try:
            import PIL  # noqa: F401 — real frame decoder loads here

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict and not self.has_pil:
            raise NotImplementedError(
                "real frame decode requires libav/PIL; not available here")
        ids, idxs, feats = [], [], []
        for asset_id, payload, kind in zip(
            t.column("asset_id").to_pylist(),
            t.column("payload").to_pylist(),
            t.column("kind").to_pylist(),
        ):
            frames = _fake_decode(payload, kind)["frames"]
            stride = max(1, -(-frames // self.max_frames))
            for i in range(0, frames, stride):
                d = hashlib.sha256(payload + b":" + str(i).encode()).digest()
                ids.append(asset_id)
                idxs.append(i)
                feats.append(
                    [float(x) for x in
                     round_half_away([b / 255.0 for b in d[:4]], 6)])
        f = np.array(feats, dtype=np.float64).reshape(-1, 4)
        cols = {"asset_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64())}
        for j in range(4):
            cols[f"f{j}"] = pa.array(f[:, j], pa.float64())
        return pa.table(cols)


class ImageResizer:
    """Actor-pool stage: aspect-preserving fit of each image into a
    ``target`` x ``target`` box. The geometry is REAL and integer-exact
    (out = dim * target // max(w, h), so the SQL oracle replays it with
    no float rounding); the pixel resample is the stubbed boundary —
    the deterministic fake emits md5(payload : outWxoutH) as the
    resized payload's fingerprint."""

    def __init__(self, target: int = 224, strict: bool = False):
        self.target = target
        self.strict = strict
        try:
            import PIL  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict and not self.has_pil:
            raise NotImplementedError(
                "real resample requires PIL; not available here")
        ids, ws, hs, ows, ohs, fps = [], [], [], [], [], []
        for asset_id, payload, kind in zip(
            t.column("asset_id").to_pylist(),
            t.column("payload").to_pylist(),
            t.column("kind").to_pylist(),
        ):
            if kind != "image":
                continue
            d = _fake_decode(payload, kind)
            w, h = d["width"], d["height"]
            m = max(w, h)
            ow, oh = w * self.target // m, h * self.target // m
            fp = hashlib.md5(
                payload + f":{ow}x{oh}".encode()).hexdigest()
            ids.append(asset_id)
            ws.append(w); hs.append(h); ows.append(ow); ohs.append(oh)
            fps.append(fp)
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "out_width": pa.array(ows, pa.int32()),
            "out_height": pa.array(ohs, pa.int32()),
            "resized_fp": pa.array(fps, pa.string()),
        })


def sample_frames(assets_ds, max_frames: int = 8, concurrency: int = 2,
                  batch_size: int = 128, strict: bool = False):
    return assets_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"max_frames": max_frames, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def resize_images(assets_ds, target: int = 224, concurrency: int = 2,
                  batch_size: int = 128, strict: bool = False):
    return assets_ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target": target, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
