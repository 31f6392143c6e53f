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


def video_params(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) — kept small so the analytic oracle
    stays cheap; the stage logic is size-independent."""
    return 8 + doc_id % 8, 8 + (doc_id * 3) % 8, 4 + doc_id % 12


def make_video_payload(doc_id: int) -> bytes:
    """``b"FVID" + u16 w + u16 h + u16 n_frames`` then ``n_frames``
    planes of ``w*h`` pixel bytes with
    ``pixel[f][i] = (seed*17 + f*53 + i*29) % 256``."""
    w, h, nf = video_params(doc_id)
    f = np.arange(nf, dtype=np.int64)[:, None]
    i = np.arange(w * h, dtype=np.int64)[None, :]
    planes = ((doc_id * 17 + f * 53 + i * 29) % 256).astype(np.uint8)
    return b"FVID" + struct.pack(">HHH", w, h, nf) + planes.tobytes()


def video_dataset(sf_dir: str):
    import ray.data as rd

    def batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["video"] * len(ids), pa.string()),
                "payload": pa.array(
                    [make_video_payload(d) for d in ids], pa.binary()
                ),
            },
            schema=MEDIA_SCHEMA,
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(batch, batch_format="pyarrow", batch_size=512)


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


class VideoFrameSampleStage:
    """media(payload) → every-``stride``-th-frame summary — the video
    frame-sample shape: parse the container header, view the payload
    as an (n_frames, w*h) plane matrix, take the strided frame slice,
    reduce vectorized. Real codecs (ffmpeg) are absent; the FVID
    fake-container path does real byte parsing so swapping in a codec
    changes only the plane extraction."""

    MAGIC = b"FVID"

    def __init__(self, stride: int = 2):
        self.stride = stride
        self.header = struct.Struct(">HHH")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, nfs, n_sampled, means = [], [], [], [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if not payload.startswith(self.MAGIC):
                raise NotImplementedError(
                    "real video decode requires ffmpeg, absent here"
                )
            w, h, nf = self.header.unpack(payload[4:10])
            planes = np.frombuffer(
                payload, dtype=np.uint8, offset=10
            ).reshape(nf, w * h)
            sampled = planes[:: self.stride]
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            nfs.append(nf)
            n_sampled.append(sampled.shape[0])
            means.append(round_half_away(float(sampled.mean()), 6))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_frames": pa.array(nfs, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int64()),
                "sampled_mean": pa.array(means, pa.float64()),
            }
        )


class ImageResizeStage:
    """media(payload) → nearest-neighbor ``size×size`` thumbnail
    summary. The resize is the real kernel (integer source-index
    grids + a fancy-index gather on the decoded pixel matrix); only
    the container decode is the fake-format stand-in."""

    MAGIC = b"FIMG"

    def __init__(self, size: int = 8):
        self.size = size
        self.header = struct.Struct(">HH")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, means, top_left = [], [], []
        s = self.size
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if not payload.startswith(self.MAGIC):
                decode_image_real(payload)  # stub: raises NotImplementedError
            w, h = self.header.unpack(payload[4:8])
            pixels = np.frombuffer(
                payload, dtype=np.uint8, offset=8
            ).reshape(h, w)
            rows = (np.arange(s) * h) // s
            cols = (np.arange(s) * w) // s
            thumb = pixels[rows][:, cols]
            ids.append(mid)
            means.append(round_half_away(float(thumb.mean()), 6))
            top_left.append(float(thumb[0, 0]))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "thumb_w": pa.array([s] * len(ids), pa.int64()),
                "thumb_h": pa.array([s] * len(ids), pa.int64()),
                "thumb_mean": pa.array(means, pa.float64()),
                "top_left": pa.array(top_left, pa.float64()),
            }
        )


def video_frame_samples(sf_dir: str, *, stride: int = 2,
                        batch_size: int = 64, concurrency=(1, 4)):
    return video_dataset(sf_dir).map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_thumbnails(sf_dir: str, *, size: int = 8, batch_size: int = 64,
                     concurrency=(1, 4)):
    import pyarrow.compute as pc

    ds = media_dataset(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow",
    )
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"size": size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
