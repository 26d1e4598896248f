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


def test_media_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(make_media_table(100))
    out = media_pipeline(ds).to_pandas()
    assert len(out) == 100
    assert out["decode_ok"].all()
