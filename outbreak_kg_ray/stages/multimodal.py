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
from outbreak_kg_ray.sources.io import parquet_rows, read_parquet_clean

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


def _doc_ids(sf_dir: str):
    """Column-pruned doc_id read, split into cluster-width blocks.

    The sf parquet is a single row group, so the read yields ONE
    block and Ray fuses the synthesis map into that one read task —
    serializing the whole encode (measured: png_media_dataset 3.0 s
    at sf0.1 with 31 CPUs idle). The repartition barrier splits the
    tiny pre-synthesis id rows and blocks the fusion, same pattern
    (and rationale) as sources/pages.py:pages_dataset split_blocks;
    at 100 TB the input files provide natural blocks instead."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    n = parquet_rows(f"{sf_dir}/documents.parquet")
    split = max(1, min(cpus, n // 64))
    return ds.repartition(split) if split > 1 else ds


def video_dataset(sf_dir: str):
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

    return _doc_ids(sf_dir).map_batches(
        batch, batch_format="pyarrow", batch_size=512
    )


def media_dataset(sf_dir: str):
    return _doc_ids(sf_dir).map_batches(
        media_batch, batch_format="pyarrow", batch_size=512
    )


# ---------------------------------------------------------------------------
# real codecs: PNG (pure stdlib zlib, critical chunks, all 5 row
# filters) and WAV (RIFF PCM). No third-party libs — the container
# has no PIL/libsndfile, and these formats need none.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type → samples/px


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc_ = abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def encode_png(pixels: np.ndarray, *, filters: str = "cycle") -> bytes:
    """Real PNG writer: 8-bit grayscale, zlib-compressed scanlines.
    ``filters="cycle"`` applies filter type ``y % 5`` per row so a
    decoder must implement ALL five filters (None/Sub/Up/Average/
    Paeth) to round-trip; ``filters="none"`` writes filter 0 rows.
    Output is a spec-valid PNG (signature, IHDR/IDAT/IEND, CRCs)."""
    import zlib

    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("encode_png expects a 2-D uint8 array")
    h, w = pixels.shape
    px = pixels.astype(np.int64)
    lines = []
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        raw = px[y]
        ftype = (y % 5) if filters == "cycle" else 0
        left = np.concatenate(([0], raw[:-1]))
        upleft = np.concatenate(([0], prev[:-1]))
        if ftype == 0:
            out = raw
        elif ftype == 1:
            out = raw - left
        elif ftype == 2:
            out = raw - prev
        elif ftype == 3:
            out = raw - (left + prev) // 2
        else:
            p = left + prev - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc_ = np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left,
                np.where(pb <= pc_, prev, upleft),
            )
            out = raw - pred
        lines.append(bytes([ftype]) + (out % 256).astype(np.uint8).tobytes())
        prev = raw
    idat = zlib.compress(b"".join(lines), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real PNG decoder (pure stdlib): critical-chunk walk with CRC
    verification, zlib inflate, full 5-filter scanline reconstruction
    (spec §6.2, including the byte-sequential Average/Paeth cases).
    Supports 8-bit depth, any color type, non-interlaced. Returns
    ``(width, height, pixels)`` with pixels shaped ``(h, w*channels)``.
    """
    import zlib

    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = channels = None
    idat = []
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise NotImplementedError("only 8-bit PNG supported")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    bpp = channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.int64)
    rpos = 0
    for y in range(h):
        ftype = raw[rpos]
        rpos += 1
        line = np.frombuffer(raw, np.uint8, stride, rpos).astype(np.int64)
        rpos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 1:
            # recon[x] = line[x] + recon[x-bpp]: per-lane cumsum mod 256
            rec = line.reshape(-1, bpp).cumsum(axis=0).reshape(-1) % 256
        elif ftype == 2:
            rec = (line + prev) % 256
        elif ftype in (3, 4):
            # left-dependent: byte-sequential per the spec
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                upleft = prev[x - bpp] if x >= bpp else 0
                if ftype == 3:
                    rec[x] = (line[x] + (left + up) // 2) % 256
                else:
                    rec[x] = (line[x] + _paeth(left, up, upleft)) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
    return w, h, out.astype(np.uint8)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Real WAV writer via the STDLIB ``wave`` module (an encoder
    independent of our hand-written RIFF decoder below, so the
    round-trip is a two-implementation cross-check): mono 16-bit PCM.
    """
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Real WAV decoder: hand-written RIFF chunk walk (fmt/data),
    PCM-16 mono → ``(sample_rate, int16 samples)``. Independent of
    the stdlib encoder above."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    bits = channels = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate = struct.unpack(
                "<HHI", body[:8]
            )
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1:
                raise NotImplementedError("only PCM WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise NotImplementedError("only mono 16-bit PCM supported")
    return sample_rate, np.frombuffer(data, dtype="<i2")


def make_png_payload(doc_id: int) -> bytes:
    """Deterministic REAL PNG: same pixel formula as FIMG
    (``(doc_id*131 + i*29) % 256`` row-major over image_dims), so the
    analytic DuckDB oracle for the decoded statistics is shared."""
    w, h = image_dims(doc_id)
    idx = np.arange(w * h, dtype=np.int64)
    pixels = ((doc_id * 131 + idx * 29) % 256).astype(np.uint8)
    return encode_png(pixels.reshape(h, w))


def make_wav_payload(doc_id: int) -> bytes:
    """Deterministic REAL WAV (stdlib encoder): params from
    audio_params; ``sample16[i] = ((doc_id*37 + i*11) % 65536) - 32768``.
    """
    sr, n = audio_params(doc_id)
    idx = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 37 + idx * 11) % 65536) - 32768
    return encode_wav(samples.astype(np.int16), sr)


def png_media_dataset(sf_dir: str):
    def batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(
                    [make_png_payload(d) for d in ids], pa.binary()
                ),
            },
            schema=MEDIA_SCHEMA,
        )

    return _doc_ids(sf_dir).map_batches(
        batch, batch_format="pyarrow", batch_size=256
    )


def wav_media_dataset(sf_dir: str):
    def batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["audio"] * len(ids), pa.string()),
                "payload": pa.array(
                    [make_wav_payload(d) for d in ids], pa.binary()
                ),
            },
            schema=MEDIA_SCHEMA,
        )

    return _doc_ids(sf_dir).map_batches(
        batch, batch_format="pyarrow", batch_size=256
    )


# ---------------------------------------------------------------------------
# decode stages (actor pools; small batches — binary payloads are big)
# ---------------------------------------------------------------------------

def _map_stage(ds, cls, *, batch_size: int, concurrency=None, **ctor):
    """Run a codec stage over ``ds`` — task pool by default, actor
    pool on request.

    These stages hold only microscopic parse state (a struct layout,
    a stride), so the __init__-once-per-ACTOR pattern buys nothing
    here while a dedicated actor pool costs a measured ~2 s spawn per
    execution (Ray reuses warm workers for tasks but starts fresh
    processes for every actor pool — the whole sf0.1 decode is ~2 s
    of compute, so the pool doubled the wall time). The default
    therefore ships a single prebuilt INSTANCE through ``map_batches``
    (constructed once on the driver, reused by every warm-worker
    task). A real decoder with heavy one-time state — model weights,
    GPU init, a large codebook — should pass ``concurrency`` to opt
    back into the actor pool, which is when per-actor ``__init__``
    matters (that wiring stays tested via the explicit-concurrency
    path)."""
    from .maputil import map_stage

    return map_stage(
        ds, cls, batch_size=batch_size, concurrency=concurrency, **ctor
    )


def decode_image_real(payload: bytes):
    """Real-codec dispatch: PNG decodes natively (pure stdlib
    decoder above).  Other real formats (JPEG, ...) would need an
    external codec library (e.g. PIL), not present in this
    container — a capability guard, not a stub: adding a format
    means adding a sniff + decoder branch here."""
    if payload.startswith(PNG_SIG):
        return decode_png(payload)
    raise NotImplementedError(
        "non-PNG image decode requires an external codec (e.g. PIL), "
        "not available in this environment; PNG and the FIMG fake "
        "container are the supported paths"
    )


class ImageDecodeStage:
    """media(payload) → per-image metadata + features.

    Actor-pool stage: any model/codec state is constructed once in
    ``__init__``; ``__call__`` parses payload bytes and computes
    features vectorized (numpy over the pixel buffer). Output feature
    columns are scalar (f_first/f_last/f_mean) for engine-agnostic
    comparison."""

    MAGIC = b"FIMG"

    def __init__(self):
        self._hdr_fmt = ">HH"  # picklable (task-pool default ships the instance)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, widths, heights, n_bytes = [], [], [], []
        f_first, f_last, f_mean = [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if payload.startswith(self.MAGIC):
                w, h = struct.unpack(self._hdr_fmt, payload[4:8])
                pixels = np.frombuffer(payload, dtype=np.uint8, offset=8)
                assert pixels.size == w * h, "truncated FIMG payload"
            else:
                # real-codec dispatch (PNG path is native)
                w, h, mat = decode_image_real(payload)
                pixels = mat.reshape(-1)
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
        self._hdr_fmt = ">HH"  # picklable (task-pool default ships the instance)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, srs, n_frames, means = [], [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if payload.startswith(self.MAGIC):
                sr, n = struct.unpack(self._hdr_fmt, payload[4:8])
                samples = np.frombuffer(payload, dtype=np.uint8, offset=8)
                assert samples.size == n, "truncated FAUD payload"
            elif payload.startswith(b"RIFF"):
                sr, samples = decode_wav(payload)  # real PCM decode
            else:
                raise NotImplementedError(
                    "compressed audio decode requires a codec library, "
                    "absent here; FAUD and RIFF/WAVE PCM are supported"
                )
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
        self._hdr_fmt = ">HHH"  # picklable (task-pool default ships the instance)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, nfs, n_sampled, means = [], [], [], [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if not payload.startswith(self.MAGIC):
                raise NotImplementedError(
                    "real video decode requires ffmpeg, absent here"
                )
            w, h, nf = struct.unpack(self._hdr_fmt, payload[4:10])
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
        self._hdr_fmt = ">HH"  # picklable (task-pool default ships the instance)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, means, top_left = [], [], []
        s = self.size
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            if payload.startswith(self.MAGIC):
                w, h = struct.unpack(self._hdr_fmt, payload[4:8])
                pixels = np.frombuffer(
                    payload, dtype=np.uint8, offset=8
                ).reshape(h, w)
            else:
                w, h, pixels = decode_image_real(payload)
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
                        batch_size: int = 64, concurrency=None):
    return _map_stage(
        video_dataset(sf_dir), VideoFrameSampleStage,
        batch_size=batch_size, concurrency=concurrency, stride=stride,
    )


def image_thumbnails(sf_dir: str, *, size: int = 8, batch_size: int = 64,
                     concurrency=None):
    import pyarrow.compute as pc

    ds = media_dataset(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow",
    )
    return _map_stage(
        ds, ImageResizeStage,
        batch_size=batch_size, concurrency=concurrency, size=size,
    )


def image_features(sf_dir: str, *, batch_size: int = 64,
                   concurrency=None):
    """Image branch: filter kind → actor-pool decode. Small batches —
    a batch of payloads must fit the worker heap."""
    import pyarrow.compute as pc

    ds = media_dataset(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow",
    )
    return _map_stage(
        ds, ImageDecodeStage,
        batch_size=batch_size, concurrency=concurrency,
    )


def png_image_features(sf_dir: str, *, batch_size: int = 64,
                       concurrency=None):
    """Image features over REAL PNG payloads: the same actor-pool
    decode stage, exercising the pure-stdlib PNG decoder (all five
    scanline filters — the encoder cycles them per row). n_bytes is
    dropped from the output because the zlib stream length is not
    analytically computable for the oracle."""
    return _map_stage(
        png_media_dataset(sf_dir), ImageDecodeStage,
        batch_size=batch_size, concurrency=concurrency,
    ).select_columns(
        ["media_id", "width", "height", "f_first", "f_last", "f_mean"]
    )


def png_thumbnails(sf_dir: str, *, size: int = 8, batch_size: int = 64,
                   concurrency=None):
    """Nearest-neighbor thumbnails over REAL PNG payloads — the
    resize kernel runs on the decoded (all-five-filters) pixel
    matrix."""
    return _map_stage(
        png_media_dataset(sf_dir), ImageResizeStage,
        batch_size=batch_size, concurrency=concurrency, size=size,
    )


def wav_audio_frames(sf_dir: str, *, stride: int = 4, batch_size: int = 64,
                     concurrency=None):
    """Frame-sample summary over REAL RIFF/WAVE PCM-16 payloads
    (stdlib ``wave`` encoder cross-checked by the hand-written RIFF
    decoder)."""
    return _map_stage(
        wav_media_dataset(sf_dir), AudioFrameSampleStage,
        batch_size=batch_size, concurrency=concurrency, stride=stride,
    )


def audio_frames(sf_dir: str, *, stride: int = 4, batch_size: int = 64,
                 concurrency=None):
    import pyarrow.compute as pc

    ds = media_dataset(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "audio")),
        batch_format="pyarrow",
    )
    return _map_stage(
        ds, AudioFrameSampleStage,
        batch_size=batch_size, concurrency=concurrency, stride=stride,
    )


class ImageAugmentStage:
    """media(payload) → deterministic random-crop + horizontal-flip
    augmentation executed on the REAL decoded pixel matrix — the
    vision-training data-prep step (RandomResizedCrop/RandomFlip made
    reproducible).  Crop box and flip flag are closed-form functions
    of media_id, so the DuckDB oracle replays the cropped statistics
    analytically while the engine does genuine codec + slicing work."""

    def __init__(self):
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, xs, ys, cws, chs, flips = [], [], [], [], [], []
        c_first, c_last, c_mean = [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(),
            t.column("payload").to_pylist(),
        ):
            w, h, mat = decode_png(payload)
            if w < 1 or h < 1:
                continue  # degenerate payload: nothing to crop
            mat = mat.reshape(h, w)
            # clamp so the crop never exceeds the image (w < 8 would
            # otherwise make the modulus zero/negative)
            cw, ch = min(w, max(8, w // 2)), min(h, max(8, h // 2))
            x0 = (mid * 13) % (w - cw + 1)
            y0 = (mid * 17) % (h - ch + 1)
            crop = mat[y0:y0 + ch, x0:x0 + cw]
            flip = mid % 2 == 1
            if flip:
                crop = crop[:, ::-1]
            ids.append(mid)
            xs.append(x0)
            ys.append(y0)
            cws.append(cw)
            chs.append(ch)
            flips.append(flip)
            c_first.append(float(crop[0, 0]))
            c_last.append(float(crop[-1, -1]))
            c_mean.append(round_half_away(float(crop.mean()), 6))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "x0": pa.array(xs, pa.int64()),
                "y0": pa.array(ys, pa.int64()),
                "crop_w": pa.array(cws, pa.int64()),
                "crop_h": pa.array(chs, pa.int64()),
                "flipped": pa.array(flips, pa.bool_()),
                "c_first": pa.array(c_first, pa.float64()),
                "c_last": pa.array(c_last, pa.float64()),
                "c_mean": pa.array(c_mean, pa.float64()),
            }
        )


def png_image_augments(sf_dir: str, *, batch_size: int = 64,
                       concurrency=None):
    """Deterministic crop+flip augmentation over REAL PNG payloads
    (see :class:`ImageAugmentStage`) — the full decode→augment
    plumbing of a vision data pipeline, oracle-checked through the
    analytic pixel formula."""
    return _map_stage(
        png_media_dataset(sf_dir), ImageAugmentStage,
        batch_size=batch_size, concurrency=concurrency,
    )


class AudioAugmentStage:
    """media(payload) → deterministic audio augmentation on the REAL
    decoded PCM buffer: circular time-shift by ``(media_id*19) % n``
    samples plus polarity inversion for odd ids — the reproducible
    stand-in for random shift/invert audio augmentation, exact in
    int16 so the oracle replays it analytically."""

    def __init__(self):
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, srs, ns, shifts, invs = [], [], [], [], []
        a_first, a_last, a_mean = [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(),
            t.column("payload").to_pylist(),
        ):
            sr, samples = decode_wav(payload)
            n = samples.size
            if n == 0:
                continue  # degenerate zero-sample WAV: skip
            shift = (mid * 19) % n
            aug = np.roll(samples.astype(np.int64), -shift)
            inv = mid % 2 == 1
            if inv:
                aug = -aug
            ids.append(mid)
            srs.append(sr)
            ns.append(n)
            shifts.append(shift)
            invs.append(inv)
            a_first.append(float(aug[0]))
            a_last.append(float(aug[-1]))
            a_mean.append(round_half_away(float(aug.mean()), 6))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(srs, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "shift": pa.array(shifts, pa.int64()),
                "inverted": pa.array(invs, pa.bool_()),
                "a_first": pa.array(a_first, pa.float64()),
                "a_last": pa.array(a_last, pa.float64()),
                "a_mean": pa.array(a_mean, pa.float64()),
            }
        )


def wav_audio_augments(sf_dir: str, *, batch_size: int = 64,
                       concurrency=None):
    """Deterministic shift+invert augmentation over REAL RIFF/WAVE
    PCM-16 payloads (see :class:`AudioAugmentStage`)."""
    return _map_stage(
        wav_media_dataset(sf_dir), AudioAugmentStage,
        batch_size=batch_size, concurrency=concurrency,
    )
