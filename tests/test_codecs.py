"""Pure-Python PNG/WAV codecs vs spec-constructed byte streams, and the
multimodal ``decoder='real'`` pipeline end-to-end over genuine payloads."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from metis_ray.functions import codecs
from metis_ray.pipelines import multimodal

SF = "/root/testdata/sf0.001"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def _spec_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Construct a PNG per the spec INDEPENDENTLY of codecs.encode_png,
    applying the given per-row filter types (0=None 1=Sub 2=Up 3=Average
    4=Paeth) — the oracle for the decoder's unfilter paths."""
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, ftype in zip(range(h), filters):
        cur = flat[y]
        filt = np.empty(w * ch, dtype=np.int32)
        for i in range(w * ch):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ftype == 0:
                filt[i] = cur[i]
            elif ftype == 1:
                filt[i] = cur[i] - a
            elif ftype == 2:
                filt[i] = cur[i] - b
            elif ftype == 3:
                filt[i] = cur[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else c)
                filt[i] = cur[i] - pred
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (codecs.PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    data = _spec_png(img, filters=[0, 1, 2, 3, 4])
    got = codecs.decode_png(data)
    assert got.shape == img.shape
    assert (got == img).all()


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_channels(ch):
    rng = np.random.RandomState(ch)
    img = rng.randint(0, 256, size=(4, 6, ch), dtype=np.uint8)
    got = codecs.decode_png(codecs.encode_png(img))
    assert (got == img).all()


def test_png_rejects_out_of_scope():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png at all")
    # 16-bit depth PNG header -> explicit NotImplementedError
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    data = (codecs.PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        codecs.decode_png(data)


def test_wav_roundtrip_and_8bit():
    rng = np.random.RandomState(9)
    samples = rng.randint(-2000, 2000, size=(40, 2)).astype(np.int16)
    arr, sr = codecs.decode_wav(codecs.encode_wav(samples, 16000))
    assert sr == 16000
    assert (arr == samples).all()

    # 8-bit PCM constructed with the stdlib writer (independent oracle)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)
        f.setframerate(8000)
        f.writeframes(bytes([0, 128, 255] * 5))
    arr8, sr8 = codecs.decode_wav(buf.getvalue())
    assert sr8 == 8000
    assert arr8.shape == (15, 1)
    assert list(arr8[:3, 0]) == [-128 << 8, 0, 127 << 8]


def test_sniff():
    img = np.zeros((2, 2, 3), np.uint8)
    assert codecs.sniff(codecs.encode_png(img)) == "image/png"
    assert codecs.sniff(codecs.encode_wav(
        np.zeros(4, np.int16), 8000)) == "audio/wav"
    assert codecs.sniff(b"\xff\xd8\xff\xe0 jpeg") is None


def test_real_decode_pipeline_end_to_end():
    """decode_features(decoder='real') over the synthesized genuine
    PNG/WAV table: every asset decodes, features are finite and in [0,1]
    bins, and the run is deterministic across batch sizes."""
    out = multimodal.decode_features(SF, batch_size=32,
                                     decoder="real").to_pandas()
    assert len(out) == 500
    feats = np.vstack([np.asarray(v, np.float32) for v in out["feature"]])
    assert np.isfinite(feats).all()
    again = multimodal.decode_features(SF, batch_size=128,
                                       decoder="real").to_pandas()
    m1 = dict(zip(out["asset_id"], [tuple(v) for v in out["feature"]]))
    m2 = dict(zip(again["asset_id"], [tuple(v) for v in again["feature"]]))
    assert m1 == m2

    # spot-check one WAV asset against a direct stdlib decode
    src = multimodal.synthesize_media_table(SF).to_pandas()
    row = src[src["asset_id"] % 2 == 1].iloc[0]
    with wave.open(io.BytesIO(row["payload"])) as f:
        frames = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    vals = frames.astype(np.float32) / 32768.0 * 0.5 + 0.5
    got = np.asarray(m1[row["asset_id"]], np.float32)
    assert abs(got[0] - vals.mean()) < 1e-5
    assert abs(got[1] - vals.std()) < 1e-5


def test_resize_real_png_path():
    """Resize(decoder='real') on genuine PNGs: output payloads are valid
    PNGs of the target size whose pixels equal the test's own
    nearest-neighbor computation."""
    import pyarrow as pa

    rng = np.random.RandomState(11)
    imgs = [rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
            for _ in range(3)]
    batch = pa.table({
        "asset_id": pa.array(range(3), pa.int64()),
        "payload": pa.array([codecs.encode_png(im) for im in imgs],
                            pa.large_binary()),
        "meta": pa.array([{"width": 13, "height": 9, "format": "image/png"}
                          for _ in imgs], multimodal.IMAGE_META),
    })
    out = multimodal.Resize(width=6, height=4, decoder="real")(batch)
    for i, im in enumerate(imgs):
        dec = codecs.decode_png(out["payload"][i].as_py())
        yi = (np.arange(4) * 9 // 4)
        xi = (np.arange(6) * 13 // 6)
        assert (dec == im[np.ix_(yi, xi)]).all()
        m = out["meta"][i].as_py()
        assert m == {"width": 6, "height": 4, "format": "image/png"}
