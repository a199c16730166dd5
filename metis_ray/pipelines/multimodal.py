"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with SMALL batches (payloads dominate block size).

The real codec libraries (PIL/ffmpeg/soundfile) are NOT available in this
environment, so the decode kernel is gated: ``decoder='real'`` raises
``NotImplementedError`` at actor construction with the exact dependency
needed, while ``decoder='fake'`` (default here, clearly marked) produces a
deterministic pseudo-decode so the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from metis_ray.sources.parquet import read_table

IMAGE_META = pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("format", pa.string())])


def synthesize_binary_table(sf_dir: str) -> rd.Dataset:
    """Deterministic stand-in asset table derived from ``documents``: the
    text bytes play the role of an encoded payload.
    (asset_id, payload: binary, meta: struct)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_assets(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [t.encode() for t in batch["text"].to_pylist()]
        meta = [{"width": (len(p) % 64) + 1, "height": (len(p) % 48) + 1,
                 "format": "fake/raw"} for p in payloads]
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "meta": pa.array(meta, IMAGE_META),
        })

    return docs.map_batches(to_assets, batch_format="pyarrow")


class DecodeAndFeaturize:
    """Actor-pool stage: payload -> fixed-size feature vector.

    ``decoder='real'`` is the production path (PIL / libvips / ffmpeg) —
    STUBBED here because those libraries are not in this container.
    ``decoder='fake'`` derives a deterministic 16-float feature from the
    payload bytes so downstream layout/consumers are exercised for real.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake") -> None:
        if decoder == "real":
            raise NotImplementedError(
                "real decode needs PIL/ffmpeg, not available in this "
                "environment; run with decoder='fake' or install codecs")
        self.decoder = decoder

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.vstack([self._fake_decode(p) for p in payloads])
        return pa.table({
            "asset_id": batch["asset_id"],
            "meta": batch["meta"],
            "feature": pa.array(list(feats), pa.list_(pa.float32(),
                                                      self.FEATURE_DIM)),
        })


def decode_features(sf_dir: str, *, batch_size: int = 64,
                    concurrency: int = 2) -> rd.Dataset:
    """Binary-asset decode pipeline: small batches (payload-heavy rows),
    actor pool, fixed-size list output. (asset_id, meta, feature)."""
    assets = synthesize_binary_table(sf_dir)
    return assets.map_batches(DecodeAndFeaturize, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              fn_constructor_kwargs={"decoder": "fake"})


class Resize:
    """Actor-pool stage: decode -> resize -> re-encode (image path).

    ``decoder='real'`` (PIL/libvips) is STUBBED — not in this container;
    the fake path derives a deterministic (h, w) uint8 image from the
    payload bytes and resizes it by nearest-neighbor index sampling, so the
    Ray plumbing (small payload batches, actor state, binary-out schema,
    updated meta struct) is real and tested."""

    def __init__(self, width: int, height: int, decoder: str = "fake") -> None:
        if decoder == "real":
            raise NotImplementedError(
                "real resize needs PIL/libvips, not available here; use "
                "decoder='fake' or install codecs")
        self.w = width
        self.h = height

    def _fake_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        reps = (w * h) // max(1, len(payload)) + 1
        return np.frombuffer((payload * reps)[:w * h],
                             dtype=np.uint8).reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch["meta"].to_pylist()
        out_payload, out_meta = [], []
        for payload, meta in zip(batch["payload"].to_pylist(), metas):
            img = self._fake_image(payload, meta["width"], meta["height"])
            yi = (np.arange(self.h) * meta["height"] // self.h)
            xi = (np.arange(self.w) * meta["width"] // self.w)
            small = img[np.ix_(yi, xi)]
            out_payload.append(small.tobytes())
            out_meta.append({"width": self.w, "height": self.h,
                             "format": "fake/resized"})
        return pa.table({
            "asset_id": batch["asset_id"],
            "payload": pa.array(out_payload, pa.large_binary()),
            "meta": pa.array(out_meta, IMAGE_META),
        })


def resize_assets(sf_dir: str, *, width: int = 16, height: int = 12,
                  batch_size: int = 64, concurrency: int = 2) -> rd.Dataset:
    """Resize pipeline over the asset table: (asset_id, payload, meta) with
    every payload exactly width*height bytes."""
    assets = synthesize_binary_table(sf_dir)
    return assets.map_batches(Resize, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              fn_constructor_kwargs={"width": width,
                                                     "height": height})


FRAME_BYTES = 256


def frame_sample(sf_dir: str, *, every_n: int = 4, frame_bytes: int = FRAME_BYTES,
                 batch_size: int = 64) -> rd.Dataset:
    """Frame sampling (video path): each payload is framed into fixed
    ``frame_bytes`` chunks and every ``every_n``-th frame is emitted as its
    own row — the flat_map shape (0..k rows out per row in) that downstream
    per-frame decode/feature stages consume.
    (asset_id, frame_idx, frame: binary)."""
    assets = synthesize_binary_table(sf_dir)

    def sample(batch: pa.Table) -> pa.Table:
        o_id, o_idx, o_frame = [], [], []
        ids = batch["asset_id"].to_numpy(zero_copy_only=False)
        for aid, payload in zip(ids, batch["payload"].to_pylist()):
            n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
            for f in range(0, n_frames, every_n):
                o_id.append(int(aid))
                o_idx.append(f)
                o_frame.append(payload[f * frame_bytes:(f + 1) * frame_bytes])
        return pa.table({
            "asset_id": pa.array(o_id, pa.int64()),
            "frame_idx": pa.array(o_idx, pa.int64()),
            "frame": pa.array(o_frame, pa.large_binary()),
        })

    return assets.map_batches(sample, batch_format="pyarrow",
                              batch_size=batch_size)
