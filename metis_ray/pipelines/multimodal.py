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
