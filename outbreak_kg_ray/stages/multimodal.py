"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payload columns with typed
metadata.

The reference has no media pipeline; these are the scale-path
components a training-data engine needs (instructions: make the
Ray-side plumbing — schema, batch size, actor signature, output
layout — real and tested; STUB the actual codec behind an
import-try).

Real codecs (PIL / libsndfile / ffmpeg) are not in this container, so
``decode_image_real`` raises ``NotImplementedError`` unless PIL is
importable. The tested path decodes a deterministic FAKE container
format (FIMG/FAUD headers below) with real byte-level parsing —
payload bytes in, numpy-vectorized features out — so swapping in a
real codec changes only the inner decode call, not the Ray plumbing.

FAKE container layouts (big-endian):
- image: ``b"FIMG" + u16 width + u16 height + width*height pixel bytes``
  with ``pixel[i] = (seed*131 + i*29) % 256``
- audio: ``b"FAUD" + u16 sample_rate + u16 n_samples + n_samples bytes``
  with ``sample[i] = (seed*37 + i*11) % 256``

Media payloads are synthesized from documents.parquet by closed-form
formulas of ``doc_id`` (no external data), which lets the DuckDB
oracle recompute the expected decode output analytically while the
stage does real byte parsing.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
from outbreak_kg_ray.functions.rounding import round_half_away
from outbreak_kg_ray.sources.io import read_parquet_clean

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
    ]
)


# ---------------------------------------------------------------------------
# deterministic payload synthesis (doc_id → media row)
# ---------------------------------------------------------------------------

def image_dims(doc_id: int) -> tuple[int, int]:
    return 16 + doc_id % 48, 16 + (doc_id * 7) % 48


def make_image_payload(doc_id: int) -> bytes:
    w, h = image_dims(doc_id)
    idx = np.arange(w * h, dtype=np.int64)
    pixels = ((doc_id * 131 + idx * 29) % 256).astype(np.uint8)
    return b"FIMG" + struct.pack(">HH", w, h) + pixels.tobytes()


def audio_params(doc_id: int) -> tuple[int, int]:
    return 8000 + (doc_id % 3) * 4000, 256 + (doc_id * 13) % 768


def make_audio_payload(doc_id: int) -> bytes:
    sr, n = audio_params(doc_id)
    idx = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 37 + idx * 11) % 256).astype(np.uint8)
    return b"FAUD" + struct.pack(">HH", sr, n) + samples.tobytes()


def media_batch(t: pa.Table) -> pa.Table:
    """documents(doc_id) batch → media rows (one image + one audio
    per doc; media_id = doc_id*2 (+1 for audio))."""
    ids, kinds, payloads = [], [], []
    for d in t.column("doc_id").to_pylist():
        ids.append(d * 2)
        kinds.append("image")
        payloads.append(make_image_payload(d))
        ids.append(d * 2 + 1)
        kinds.append("audio")
        payloads.append(make_audio_payload(d))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_dataset(sf_dir: str):
    import ray.data as rd

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(media_batch, batch_format="pyarrow", batch_size=512)


# ---------------------------------------------------------------------------
# decode stages (actor pools; small batches — binary payloads are big)
# ---------------------------------------------------------------------------

def decode_image_real(payload: bytes):
    """Real-codec path, stubbed: requires PIL, absent here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL, which is not available in "
            "this environment; use the FIMG fake-container path"
        ) from e
    raise NotImplementedError("real decode wiring lands with the codec")


class ImageDecodeStage:
    """media(payload) → per-image metadata + features.

    Actor-pool stage: any model/codec state is constructed once in
    ``__init__``; ``__call__`` parses payload bytes and computes
    features vectorized (numpy over the pixel buffer). Output feature
    columns are scalar (f_first/f_last/f_mean) for engine-agnostic
    comparison."""

    MAGIC = b"FIMG"

    def __init__(self):
        self.header = struct.Struct(">HH")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, widths, heights, n_bytes = [], [], [], []
        f_first, f_last, f_mean = [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if not payload.startswith(self.MAGIC):
                decode_image_real(payload)  # stub: raises NotImplementedError
            w, h = self.header.unpack(payload[4:8])
            pixels = np.frombuffer(payload, dtype=np.uint8, offset=8)
            assert pixels.size == w * h, "truncated FIMG payload"
            ids.append(mid)
            widths.append(w)
            heights.append(h)
            n_bytes.append(len(payload))
            f_first.append(float(pixels[0]))
            f_last.append(float(pixels[-1]))
            f_mean.append(round_half_away(float(pixels.mean()), 6))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "f_first": pa.array(f_first, pa.float64()),
                "f_last": pa.array(f_last, pa.float64()),
                "f_mean": pa.array(f_mean, pa.float64()),
            }
        )


class AudioFrameSampleStage:
    """media(payload) → every-kth-sample frame summary (the
    frame-sample shape for audio/video: stride over the sample
    buffer, vectorized)."""

    MAGIC = b"FAUD"

    def __init__(self, stride: int = 4):
        self.stride = stride
        self.header = struct.Struct(">HH")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, srs, n_frames, means = [], [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if not payload.startswith(self.MAGIC):
                raise NotImplementedError(
                    "real audio decode requires an audio codec, absent here"
                )
            sr, n = self.header.unpack(payload[4:8])
            samples = np.frombuffer(payload, dtype=np.uint8, offset=8)
            assert samples.size == n, "truncated FAUD payload"
            frames = samples[:: self.stride]
            ids.append(mid)
            srs.append(sr)
            n_frames.append(int(frames.size))
            means.append(round_half_away(float(frames.mean()), 6))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(srs, pa.int64()),
                "n_frames": pa.array(n_frames, pa.int64()),
                "frame_mean": pa.array(means, pa.float64()),
            }
        )


def image_features(sf_dir: str, *, batch_size: int = 64,
                   concurrency=(1, 4)):
    """Image branch: filter kind → actor-pool decode. Small batches —
    a batch of payloads must fit the worker heap."""
    import pyarrow.compute as pc

    ds = media_dataset(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow",
    )
    return ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_frames(sf_dir: str, *, stride: int = 4, batch_size: int = 64,
                 concurrency=(1, 4)):
    import pyarrow.compute as pc

    ds = media_dataset(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "audio")),
        batch_format="pyarrow",
    )
    return ds.map_batches(
        AudioFrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
