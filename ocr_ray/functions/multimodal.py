"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by actor-pool map_batches stages.

The image/audio codec libraries are not available in this container, so the
default DECODE KERNEL is a deterministic synthetic-header parser. The
backend is CONFIG-DRIVEN through the codec seam (``register_codec`` /
``get_codec`` / ``$OCR_RAY_IMAGE_CODEC``): a real deployment selects
``cv2`` or ``pillow`` (or registers its own factory) without editing this
module, and the factory runs once per actor in ``__init__``. Everything
Ray-side — schema, batch sizing for large binary rows, actor signature,
output layout — is real and tested (per the round brief's multimodal
requirement).

Synthetic payload format (deterministic): b"IMG1" + width:u16 + height:u16 +
channels:u8 + raw bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data as rd

__all__ = [
    "MEDIA_SCHEMA",
    "make_media_table",
    "make_video_table",
    "FakeImageDecoder",
    "ImageResizer",
    "FrameSampler",
    "decode_real",
    "register_codec",
    "get_codec",
    "media_pipeline",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio" | "video"
        ("payload", pa.binary()),       # opaque encoded bytes
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_channels", pa.int32()),
    ]
)

_MAGIC = b"IMG1"


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (seeded, no wall clock)."""
    rng = np.random.RandomState(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        w, h, c = int(rng.randint(8, 64)), int(rng.randint(8, 64)), 3
        body = rng.randint(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(_MAGIC + struct.pack("<HHB", w, h, c) + body)
        rows["meta_width"].append(w)
        rows["meta_height"].append(h)
        rows["meta_channels"].append(c)
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA], schema=MEDIA_SCHEMA
    )


# --- codec seam ------------------------------------------------------------
# Decoder backends register here and are selected by NAME — via the
# OCR_RAY_IMAGE_CODEC env var or an explicit ``codec=`` argument — so a
# real deployment swaps cv2/PIL in WITHOUT editing this module (config,
# not code). A backend is a FACTORY returning ``bytes -> ndarray | None``;
# the factory runs once per actor (in ``FakeImageDecoder.__init__``), which
# is where the heavy codec import/model load belongs.
_CODEC_ENV = "OCR_RAY_IMAGE_CODEC"
_CODEC_REGISTRY: dict[str, object] = {}


def register_codec(name: str, factory) -> None:
    """Register a decode backend: ``factory() -> (payload: bytes) ->
    ndarray | None`` (None = undecodable payload, skip-and-continue)."""
    _CODEC_REGISTRY[name] = factory


def get_codec(name: str | None = None):
    """Resolve a decode kernel by name (default: $OCR_RAY_IMAGE_CODEC,
    falling back to the deterministic synthetic parser)."""
    import os

    name = name or os.environ.get(_CODEC_ENV, "synthetic")
    if name not in _CODEC_REGISTRY:
        raise KeyError(
            f"unknown image codec {name!r}; registered: "
            f"{sorted(_CODEC_REGISTRY)} (register_codec to add one)"
        )
    return _CODEC_REGISTRY[name]()


def _synthetic_factory():
    def decode(payload: bytes) -> np.ndarray | None:
        if payload[:4] != _MAGIC or len(payload) < 9:
            return None
        w, h, c = struct.unpack("<HHB", payload[4:9])
        body = np.frombuffer(payload[9 : 9 + w * h * c], dtype=np.uint8)
        if body.size != w * h * c:
            return None
        return body.reshape(h, w, c)

    return decode


def _cv2_factory():
    try:
        import cv2  # noqa: F401 — absent in this container; real deployments have it
    except ImportError as e:
        raise NotImplementedError(
            "cv2 not installed in this environment; use the 'synthetic' "
            "codec or install opencv-python"
        ) from e

    def decode(payload: bytes) -> np.ndarray | None:
        import cv2

        return cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR)

    return decode


def _pillow_factory():
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Pillow not installed in this environment; use the 'synthetic' "
            "codec or install Pillow"
        ) from e

    def decode(payload: bytes) -> np.ndarray | None:
        import io

        import PIL.Image

        try:
            return np.asarray(PIL.Image.open(io.BytesIO(payload)))
        except Exception:  # undecodable payload: skip, don't kill the task
            return None

    return decode


def _png_factory():
    # real-format backend with no third-party dependency (stdlib zlib):
    # exercises the seam end-to-end where cv2/Pillow are absent
    from .png_codec import png_factory

    return png_factory()


def _jpeg_factory():
    # baseline-JPEG backend (pure Python/numpy) — JPEG is the reference's
    # actual payload format; see jpeg_codec module docstring for the
    # supported subset
    from .jpeg_codec import jpeg_factory

    return jpeg_factory()


register_codec("synthetic", _synthetic_factory)
register_codec("cv2", _cv2_factory)
register_codec("pillow", _pillow_factory)
register_codec("png", _png_factory)
register_codec("jpeg", _jpeg_factory)


def decode_real(payload: bytes, codec: str | None = None) -> np.ndarray:
    """Real-codec decode entry point: resolves the configured backend
    (default ``cv2``) through the seam. In this container the codec libs
    are absent, so resolution raises NotImplementedError — the swap-in is
    ``OCR_RAY_IMAGE_CODEC=cv2`` (or ``pillow``) in the deployment env, not
    an edit to this function."""
    import os

    return get_codec(codec or os.environ.get(_CODEC_ENV, "cv2"))(payload)


class FakeImageDecoder:
    """Actor-pool decode/feature stage. ``__init__`` is where a real
    deployment loads the codec/model once per actor (A1/A4 pattern);
    ``__call__`` decodes each payload and emits fixed-size features.

    Use with small batch_size: batches carry multi-KB..MB binary rows, so
    batch_size * concurrency * row_bytes must fit the worker heap
    (SURVEY.md §4 memory row)."""

    def __init__(self, codec: str | None = None) -> None:
        # per-actor codec resolution through the config seam: the factory
        # (and any heavy import/model load inside it) runs once here, not
        # per batch; backend chosen by arg or $OCR_RAY_IMAGE_CODEC
        self._decode = get_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, ok, means, widths, heights = [], [], [], [], []
        for mid, p in zip(ids, payloads):
            img = self._decode(p)
            out_id.append(mid)
            if img is None:
                ok.append(False)
                means.append(0.0)
                widths.append(0)
                heights.append(0)
            else:
                ok.append(True)
                means.append(float(np.round(img.mean(), 6)))
                heights.append(img.shape[0])
                widths.append(img.shape[1])
        return pa.Table.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(ok, pa.bool_()),
                pa.array(means, pa.float64()),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
            ],
            names=["media_id", "decode_ok", "mean_value", "width", "height"],
        )


def media_pipeline(
    media: rd.Dataset, concurrency=(1, 4), codec: str | None = None
) -> rd.Dataset:
    """Decode/feature-extract stage wired the way a real image pipeline
    would be: actor pool, small batches for large binary rows. ``codec``
    selects the decode backend per the seam (default:
    $OCR_RAY_IMAGE_CODEC, else synthetic)."""
    return media.map_batches(
        FakeImageDecoder,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResizer(FakeImageDecoder):
    """Actor-pool resize stage (decode -> nearest-neighbor resize ->
    re-encode). The resize itself is pure numpy striding — REAL compute,
    no codec needed; only the byte-level decode is behind the fake header
    parser. Emits the same payload format at (out_w, out_h)."""

    def __init__(self, out_w: int = 16, out_h: int = 16) -> None:
        super().__init__()
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_payload, out_w, out_h = [], [], [], []
        for mid, p in zip(ids, payloads):
            img = self._decode(p)
            out_id.append(mid)
            if img is None:
                out_payload.append(b"")
                out_w.append(0)
                out_h.append(0)
                continue
            h, w, c = img.shape
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            small = img[yi][:, xi]  # nearest-neighbor
            out_payload.append(
                _MAGIC + struct.pack("<HHB", self.out_w, self.out_h, c)
                + small.tobytes()
            )
            out_w.append(self.out_w)
            out_h.append(self.out_h)
        return pa.Table.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_payload, pa.binary()),
                pa.array(out_w, pa.int32()),
                pa.array(out_h, pa.int32()),
            ],
            names=["media_id", "payload", "width", "height"],
        )


VIDEO_MAGIC = b"VID1"


def make_video_table(n: int, seed: int = 43, frames: int = 24) -> pa.Table:
    """Deterministic synthetic video table: VID1 + n_frames:u16 + w:u16 +
    h:u16 + concatenated grayscale frames."""
    rng = np.random.RandomState(seed)
    rows_id, rows_payload, rows_frames = [], [], []
    for i in range(n):
        w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
        body = rng.randint(0, 256, size=frames * w * h, dtype=np.uint8).tobytes()
        rows_id.append(i)
        rows_payload.append(VIDEO_MAGIC + struct.pack("<HHH", frames, w, h) + body)
        rows_frames.append(frames)
    return pa.Table.from_pydict(
        {"media_id": pa.array(rows_id, pa.int64()),
         "payload": pa.array(rows_payload, pa.binary()),
         "n_frames": pa.array(rows_frames, pa.int32())}
    )


class FrameSampler:
    """Actor-pool frame-sampling stage: decode the synthetic video
    container, keep every ``stride``-th frame, emit per-kept-frame feature
    rows (flat_map shape: one input row -> several output rows). The
    sampling arithmetic is real; only the container parse is synthetic."""

    def __init__(self, stride: int = 8) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_mean = [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload").to_pylist()):
            if p[:4] != VIDEO_MAGIC or len(p) < 10:
                # skip-and-continue over hostile input (a valid magic with a
                # truncated header must not kill the task)
                continue
            n_frames, w, h = struct.unpack("<HHH", p[4:10])
            body = np.frombuffer(p[10 : 10 + n_frames * w * h], dtype=np.uint8)
            if body.size != n_frames * w * h:
                continue
            vid = body.reshape(n_frames, h, w)
            for f in range(0, n_frames, self.stride):
                out_id.append(mid)
                out_frame.append(f)
                out_mean.append(float(np.round(vid[f].mean(), 6)))
        return pa.Table.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_frame, pa.int32()),
                pa.array(out_mean, pa.float64()),
            ],
            names=["media_id", "frame_idx", "mean_value"],
        )
