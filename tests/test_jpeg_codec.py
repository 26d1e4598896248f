"""Baseline-JPEG codec seam evidence (VERDICT r4 item 9): JPEG is the
reference's actual payload format (reference test_img.py:38 decodes
JPEGs via cv2); this pure-Python backend runs through the SAME
actor-pool decode stage as the synthetic/PNG codecs. JPEG is lossy, so
parity is exact only where the format is exact (uniform blocks) and
toleranced elsewhere (quality=100 leaves only DCT/color rounding)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.functions.jpeg_codec import decode_jpeg, encode_jpeg
from ocr_ray.functions.multimodal import (
    _MAGIC,
    get_codec,
    make_media_table,
    media_pipeline,
)


@pytest.mark.parametrize("shape", [(16, 16, 3), (17, 23, 3), (9, 13), (8, 8)])
def test_jpeg_roundtrip_q100_tolerance(shape):
    """quality=100 => all-ones quant tables: the only loss is DCT float
    rounding (greyscale) + YCbCr rounding (color). Worst-case random
    noise stays within 1 (grey) / 3 (color) levels."""
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out is not None and out.shape == img.shape and out.dtype == np.uint8
    tol = 3 if len(shape) == 3 else 1
    assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_jpeg_uniform_blocks_exact():
    """A uniform image quantizes to a pure DC block: roundtrip exact at
    any quality — the deterministic anchor for the lossy format."""
    for v in (0, 77, 128, 255):
        img = np.full((24, 16, 3), v, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=75))
        np.testing.assert_array_equal(out, img)
    grey = np.full((11, 30), 200, np.uint8)
    np.testing.assert_array_equal(decode_jpeg(encode_jpeg(grey, quality=50)), grey)


def test_jpeg_quality_monotone_size():
    """Lower quality => coarser quantization => fewer entropy bits. Also
    pins the quality-scaling convention (q=50 is the unscaled table)."""
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (25, 50, 90, 100)]
    assert sizes == sorted(sizes), sizes
    out = decode_jpeg(encode_jpeg(img, quality=25))
    assert out is not None and out.shape == img.shape


def test_jpeg_rejects_malformed_and_out_of_subset():
    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    good = encode_jpeg(img)
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(good[:40]) is None  # truncated mid-header
    assert decode_jpeg(good[:-4]) is None  # truncated entropy stream
    # progressive (SOF2) declared instead of SOF0: out of subset
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None
    # 2x2 luma subsampling declared: out of subset
    sub = bytearray(good)
    sub[sof + 11] = 0x22  # first component's sampling byte
    assert decode_jpeg(bytes(sub)) is None


def _jpeg_media_table(synthetic: pa.Table, quality: int) -> pa.Table:
    """Re-encode the synthetic table's pixels as real JPEG payloads."""
    payloads = []
    for p in synthetic.column("payload").to_pylist():
        w, h, c = struct.unpack("<HHB", p[4:9])
        img = np.frombuffer(p[9 : 9 + w * h * c], np.uint8).reshape(h, w, c)
        payloads.append(encode_jpeg(img, quality=quality))
    return synthetic.set_column(
        synthetic.schema.get_field_index("payload"),
        "payload",
        pa.array(payloads, pa.binary()),
    )


def test_jpeg_codec_actor_pool_parity(ray_session):
    """The lossy backend through the real Ray plumbing: same pixels as
    synthetic-container vs JPEG payloads produce the same shapes, all
    rows decode, and per-image means agree within the q100 rounding
    bound (|err| <= 3 per pixel => |mean err| <= 3)."""
    import ray.data as rd

    synth = make_media_table(30)
    via_synth = (
        media_pipeline(rd.from_arrow(synth), codec="synthetic")
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    via_jpeg = (
        media_pipeline(
            rd.from_arrow(_jpeg_media_table(synth, quality=100)), codec="jpeg"
        )
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert via_jpeg["decode_ok"].all()
    assert (via_jpeg["width"] == via_synth["width"]).all()
    assert (via_jpeg["height"] == via_synth["height"]).all()
    assert (via_jpeg["mean_value"] - via_synth["mean_value"]).abs().max() <= 3.0


def test_jpeg_codec_env_selection(monkeypatch):
    """$OCR_RAY_IMAGE_CODEC=jpeg resolves the backend through the seam."""
    monkeypatch.setenv("OCR_RAY_IMAGE_CODEC", "jpeg")
    dec = get_codec()
    img = np.full((6, 10, 3), 42, np.uint8)
    np.testing.assert_array_equal(dec(encode_jpeg(img)), img)
    assert dec(_MAGIC + b"\x00\x00") is None  # synthetic container != JPEG