"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with SMALL batches (payloads dominate block size).

Decode kernels are gated by ``decoder=``:

- ``decoder='real'`` decodes ACTUAL payload bytes with the pure-Python
  stdlib codecs in ``metis_ray.functions.codecs`` (8-bit PNG via zlib,
  8/16-bit PCM WAV via ``wave``) — the formats this engine itself emits.
  Payloads outside that scope (JPEG, video containers, ...) raise
  ``NotImplementedError`` naming the codec library a production deploy
  would install (PIL/libvips/ffmpeg) behind this same gate.
- ``decoder='fake'`` (default for the driver queries) produces a
  deterministic pseudo-decode so the Ray-side plumbing — schema, actor
  signature, batch sizing, output layout — is exercised without any
  codec at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from metis_ray.functions import codecs
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


def synthesize_media_table(sf_dir: str) -> rd.Dataset:
    """Deterministic REAL-media asset table derived from ``documents``:
    even doc_ids become actual PNG images (pixels seeded from the text
    bytes), odd doc_ids become actual 16-bit PCM WAV clips. Exercises the
    ``decoder='real'`` path end-to-end with genuine codec byte streams.
    (asset_id, payload: binary, meta: struct)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads, metas = [], []
        for i, text in zip(ids, batch["text"].to_pylist()):
            raw = text.encode() or b"\x00"
            if i % 2 == 0:
                w, h = (len(raw) % 13) + 3, (len(raw) % 9) + 3
                reps = (w * h * 3) // len(raw) + 1
                img = np.frombuffer((raw * reps)[:w * h * 3],
                                    np.uint8).reshape(h, w, 3)
                payloads.append(codecs.encode_png(img))
                metas.append({"width": w, "height": h,
                              "format": "image/png"})
            else:
                n = (len(raw) % 50) + 20
                reps = (n * 2) // len(raw) + 1
                samples = np.frombuffer((raw * reps)[:n * 2], "<i2")
                payloads.append(codecs.encode_wav(samples, 8000))
                metas.append({"width": n, "height": 1,
                              "format": "audio/wav"})
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "meta": pa.array(metas, IMAGE_META),
        })

    return docs.map_batches(to_media, batch_format="pyarrow")


class DecodeAndFeaturize:
    """Actor-pool stage: payload -> fixed-size feature vector.

    ``decoder='real'`` decodes actual PNG/WAV bytes (stdlib codecs,
    ``functions/codecs.py``) and extracts a 16-float signal feature
    (mean, std, shape + a 12-bin value histogram) from the decoded
    samples; payloads outside PNG/WAV raise ``NotImplementedError``
    naming the library (PIL/ffmpeg) a production deploy installs behind
    this gate. ``decoder='fake'`` derives a deterministic 16-float
    feature from the payload bytes so downstream layout/consumers are
    exercised without any codec.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0

    def _real_decode(self, payload: bytes) -> np.ndarray:
        fmt = codecs.sniff(payload)
        if fmt == "image/png":
            img = codecs.decode_png(payload)
            vals = img.astype(np.float32).ravel() / 255.0
            shape = (img.shape[0] / 4096.0, img.shape[1] / 4096.0)
        elif fmt == "audio/wav":
            samples, sr = codecs.decode_wav(payload)
            vals = samples.astype(np.float32).ravel() / 32768.0 * 0.5 + 0.5
            shape = (len(samples) / float(max(sr, 1)), samples.shape[1] / 8.0)
        else:
            raise NotImplementedError(
                "real decode handles PNG/WAV via the stdlib fallback "
                "codecs; this payload needs PIL/ffmpeg — install them and "
                "extend this gate")
        hist, _ = np.histogram(vals, bins=self.FEATURE_DIM - 4,
                               range=(0.0, 1.0))
        hist = hist.astype(np.float32) / max(1, vals.size)
        return np.concatenate([
            np.array([vals.mean(), vals.std(), *shape], dtype=np.float32),
            hist])

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = (self._real_decode if self.decoder == "real"
                  else self._fake_decode)
        feats = np.vstack([decode(p) for p in batch["payload"].to_pylist()])
        return pa.table({
            "asset_id": batch["asset_id"],
            "meta": batch["meta"],
            "feature": pa.array(list(feats), pa.list_(pa.float32(),
                                                      self.FEATURE_DIM)),
        })


def decode_features(sf_dir: str, *, batch_size: int = 64,
                    concurrency: int = 2,
                    decoder: str = "fake") -> rd.Dataset:
    """Binary-asset decode pipeline: small batches (payload-heavy rows),
    actor pool, fixed-size list output. (asset_id, meta, feature).
    ``decoder='real'`` runs over the synthesized REAL PNG/WAV table and
    decodes the actual byte streams."""
    assets = (synthesize_media_table(sf_dir) if decoder == "real"
              else synthesize_binary_table(sf_dir))
    return assets.map_batches(DecodeAndFeaturize, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              fn_constructor_kwargs={"decoder": decoder})


class Resize:
    """Actor-pool stage: decode -> resize -> re-encode (image path).

    ``decoder='real'`` decodes a real PNG payload, resizes by
    nearest-neighbor index sampling, and re-encodes PNG (stdlib codecs —
    a PIL/libvips deploy swaps in behind the same gate). The fake path
    derives a deterministic (h, w) uint8 image from the payload bytes and
    resizes it the same way, so the Ray plumbing (small payload batches,
    actor state, binary-out schema, updated meta struct) is exercised
    without any codec."""

    def __init__(self, width: int, height: int, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.w = width
        self.h = height
        self.decoder = decoder

    def _fake_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        reps = (w * h) // max(1, len(payload)) + 1
        return np.frombuffer((payload * reps)[:w * h],
                             dtype=np.uint8).reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch["meta"].to_pylist()
        out_payload, out_meta = [], []
        for payload, meta in zip(batch["payload"].to_pylist(), metas):
            if self.decoder == "real":
                img = codecs.decode_png(payload)   # (h, w, ch)
                src_h, src_w = img.shape[:2]
            else:
                img = self._fake_image(payload, meta["width"], meta["height"])
                src_h, src_w = meta["height"], meta["width"]
            yi = (np.arange(self.h) * src_h // self.h)
            xi = (np.arange(self.w) * src_w // self.w)
            small = img[np.ix_(yi, xi)]
            if self.decoder == "real":
                out_payload.append(codecs.encode_png(small))
                out_meta.append({"width": self.w, "height": self.h,
                                 "format": "image/png"})
            else:
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
