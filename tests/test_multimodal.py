"""Multimodal plumbing tests: binary columns, actor-pool decode stage,
stubbed real decoder."""

import numpy as np
import pytest

from ocr_ray.functions.multimodal import (
    FakeImageDecoder,
    decode_real,
    make_media_table,
    media_pipeline,
)


def test_media_table_deterministic():
    a = make_media_table(5)
    b = make_media_table(5)
    assert a.equals(b)
    assert a.schema.field("payload").type == "binary"


def test_fake_decoder_roundtrip():
    dec = FakeImageDecoder()
    t = make_media_table(3)
    out = dec(t).to_pylist()
    for row, meta_w, meta_h in zip(
        out, t.column("meta_width").to_pylist(), t.column("meta_height").to_pylist()
    ):
        assert row["decode_ok"]
        assert row["width"] == meta_w and row["height"] == meta_h
        assert 0.0 <= row["mean_value"] <= 255.0


def test_fake_decoder_rejects_garbage():
    import pyarrow as pa

    dec = FakeImageDecoder()
    bad = pa.Table.from_pylist([{"media_id": 0, "payload": b"NOTIMG123"}])
    out = dec(bad).to_pylist()[0]
    assert not out["decode_ok"]


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"anything")


def test_codec_seam_config_driven(monkeypatch):
    """The decode backend is selected by config (env var / registry), not
    by editing the module: a registered custom codec flows into the actor
    stage via OCR_RAY_IMAGE_CODEC; unknown names fail loudly."""
    from ocr_ray.functions import multimodal as mm

    calls = []

    def factory():
        calls.append("loaded")  # per-actor load happens at __init__ time

        def decode(payload):
            return np.zeros((2, 2, 3), dtype=np.uint8)

        return decode

    mm.register_codec("testcodec", factory)
    try:
        monkeypatch.setenv("OCR_RAY_IMAGE_CODEC", "testcodec")
        dec = mm.FakeImageDecoder()
        assert calls == ["loaded"]
        out = dec(make_media_table(2)).to_pylist()
        assert all(r["decode_ok"] and r["width"] == 2 for r in out)
        with pytest.raises(KeyError, match="unknown image codec"):
            mm.get_codec("nope")
    finally:
        mm._CODEC_REGISTRY.pop("testcodec", None)


def test_media_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(make_media_table(100))
    out = media_pipeline(ds).to_pandas()
    assert len(out) == 100
    assert out["decode_ok"].all()


def test_image_resizer_roundtrip(ray_session):
    """Resize stage: real nearest-neighbor numpy resize, payload format
    preserved, decodable by the same decoder at the new dims."""
    import ray.data as rd

    from ocr_ray.functions.multimodal import (
        FakeImageDecoder,
        ImageResizer,
        make_media_table,
    )

    media = rd.from_arrow(make_media_table(20))
    out = media.map_batches(
        ImageResizer, batch_format="pyarrow", batch_size=8,
        concurrency=(1, 2), num_cpus=1,
        fn_constructor_kwargs={"out_w": 12, "out_h": 10},
    ).to_pandas()
    assert len(out) == 20
    assert (out["width"] == 12).all() and (out["height"] == 10).all()
    dec = FakeImageDecoder()
    img = dec._decode(out["payload"].iloc[0])
    assert img is not None and img.shape == (10, 12, 3)


def test_frame_sampler(ray_session):
    """Frame sampling: every stride-th frame, one output row per kept
    frame, means match a direct numpy replay."""
    import numpy as np
    import struct

    import ray.data as rd

    from ocr_ray.functions.multimodal import VIDEO_MAGIC, FrameSampler, make_video_table

    table = make_video_table(6, frames=24)
    out = (
        rd.from_arrow(table)
        .map_batches(FrameSampler, batch_format="pyarrow", batch_size=4,
                     concurrency=(1, 2), num_cpus=1)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 6 * 3  # 24 frames, stride 8 -> frames 0, 8, 16
    assert set(out["frame_idx"]) == {0, 8, 16}
    p = table.column("payload")[0].as_py()
    n_frames, w, h = struct.unpack("<HHH", p[4:10])
    vid = np.frombuffer(p[10:], dtype=np.uint8).reshape(n_frames, h, w)
    got = out[out["media_id"] == 0].set_index("frame_idx")["mean_value"]
    for f in (0, 8, 16):
        assert got[f] == float(np.round(vid[f].mean(), 6))


def test_frame_sampler_truncated_header_skipped():
    """A payload with a valid magic but <10 bytes must be skipped, not
    crash the task (total over hostile input)."""
    import pyarrow as pa

    from ocr_ray.functions.multimodal import VIDEO_MAGIC, FrameSampler

    t = pa.Table.from_pydict(
        {"media_id": pa.array([1, 2], pa.int64()),
         "payload": pa.array([VIDEO_MAGIC + b"\x01", b"junk"], pa.binary())}
    )
    out = FrameSampler()(t)
    assert out.num_rows == 0
