"""Real-format codec seam evidence: a pure-Python PNG backend (stdlib
zlib — no cv2/Pillow in this container) runs through the SAME actor-pool
decode stage as the synthetic codec and yields identical features for
identical pixels."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.functions.multimodal import (
    _MAGIC,
    get_codec,
    make_media_table,
    media_pipeline,
)
from ocr_ray.functions.png_codec import decode_png, encode_png


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(11, 7, 3), (9, 13)])
def test_png_roundtrip_all_filters(filter_type, shape):
    rng = np.random.RandomState(7 + filter_type)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out is not None and out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_png_rejects_malformed():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = encode_png(img)
    assert decode_png(b"not a png") is None
    assert decode_png(good[:20]) is None  # truncated
    # flip one IDAT byte: CRC check must reject, not return garbage
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF
    assert decode_png(bytes(corrupt)) is None
    # out-of-subset: RGBA (color type 6) declared in IHDR
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    assert decode_png(b"\x89PNG\r\n\x1a\n" + chunk) is None


def _png_media_table(synthetic: pa.Table) -> pa.Table:
    """Re-encode the synthetic table's pixels as real PNG payloads."""
    payloads = []
    for p in synthetic.column("payload").to_pylist():
        w, h, c = struct.unpack("<HHB", p[4:9])
        img = np.frombuffer(p[9 : 9 + w * h * c], np.uint8).reshape(h, w, c)
        payloads.append(encode_png(img))
    return synthetic.set_column(
        synthetic.schema.get_field_index("payload"),
        "payload",
        pa.array(payloads, pa.binary()),
    )


def test_png_codec_actor_pool_parity(ray_session):
    """The non-synthetic backend through the real Ray plumbing: identical
    pixels as synthetic-container vs PNG payloads produce identical
    feature rows from the actor-pool stage."""
    import ray.data as rd

    synth = make_media_table(30)
    via_synth = (
        media_pipeline(rd.from_arrow(synth), codec="synthetic")
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    via_png = (
        media_pipeline(rd.from_arrow(_png_media_table(synth)), codec="png")
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert via_png["decode_ok"].all()
    import pandas.testing as pdt

    pdt.assert_frame_equal(via_synth, via_png)


def test_png_codec_env_selection(monkeypatch):
    """$OCR_RAY_IMAGE_CODEC=png resolves the real-format backend through
    the seam (config, not code)."""
    monkeypatch.setenv("OCR_RAY_IMAGE_CODEC", "png")
    dec = get_codec()
    img = np.full((5, 6, 3), 9, dtype=np.uint8)
    np.testing.assert_array_equal(dec(encode_png(img)), img)
    assert dec(_MAGIC + b"\x00\x00") is None  # synthetic container != PNG
