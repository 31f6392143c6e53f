"""Audio DSP feature extraction over binary WAV payloads: framed
power spectrogram band energies + spectral centroid — the
feature-extraction stage an audio training pipeline runs after
decode (speech/audio dataset prep: VAD features, dedup fingerprints,
quality gates all start from exactly this framed-FFT shape).

Runs as an actor-pool ``map_batches`` stage over the same
deterministic REAL RIFF/WAVE PCM-16 payloads the multimodal family
uses (`stages/multimodal.py:make_wav_payload` — stdlib ``wave``
encoder, hand-written RIFF decoder), so the decode plumbing is real
end-to-end; the FFT is numpy's rfft (rows-only: not SQL-expressible;
pinned against a single-process numpy reference in
tests/test_multimodal.py).

Scale shape: pure streaming — each payload maps to ``bands`` long
rows; no shuffle anywhere.  Binary payloads are large, so the stage
uses small batches (the multimodal convention) and frames with a
vectorized stride-trick view, one rfft call per payload (batched over
frames), zero per-frame Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def spectrogram_features(
    payload: bytes, *, frame: int = 256, hop: int = 128, bands: int = 8
) -> tuple[int, np.ndarray, float]:
    """→ (n_frames, band mean-power energies [bands], spectral
    centroid in Hz).  Rectangular window (deterministic, documented);
    frames are complete only (trailing partial dropped); band b
    averages the power of rfft bins [b·B/bands, (b+1)·B/bands) with
    B = frame//2 + 1 bins."""
    from .multimodal import decode_wav

    sr, samples = decode_wav(payload)
    x = samples.astype(np.float64)
    n_frames = max(0, (len(x) - frame) // hop + 1)
    if n_frames == 0:
        return 0, np.zeros(bands), 0.0
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx]  # (n_frames, frame)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, B)
    nbins = spec.shape[1]
    edges = (np.arange(bands + 1) * nbins) // bands
    energies = np.array(
        [spec[:, edges[b]:edges[b + 1]].mean() for b in range(bands)]
    )
    freqs = np.fft.rfftfreq(frame, d=1.0 / sr)
    tot = spec.sum()
    centroid = float((spec.sum(axis=0) * freqs).sum() / tot) if tot > 0 else 0.0
    return n_frames, energies, centroid


class SpectrogramStage:
    """Actor-pool stage: WAV payload batches → long-format band
    energies.  Decoder + parameters bind once per actor."""

    def __init__(self, frame: int = 256, hop: int = 128,
                 bands: int = 8) -> None:
        self._frame, self._hop, self._bands = frame, hop, bands

    def __call__(self, t: pa.Table) -> pa.Table:
        from outbreak_kg_ray.functions.rounding import round_half_away

        ids, band_ix, energy, nfr, cent = [], [], [], [], []
        for mid, payload in zip(
            t.column("media_id").to_pylist(),
            t.column("payload").to_pylist(),
        ):
            n_frames, energies, centroid = spectrogram_features(
                payload, frame=self._frame, hop=self._hop,
                bands=self._bands,
            )
            for b in range(self._bands):
                ids.append(mid)
                band_ix.append(b)
                energy.append(round_half_away(float(energies[b]), 4))
                nfr.append(n_frames)
                cent.append(round_half_away(centroid, 4))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "band": pa.array(band_ix, pa.int64()),
             "energy": pa.array(energy, pa.float64()),
             "n_frames": pa.array(nfr, pa.int64()),
             "centroid_hz": pa.array(cent, pa.float64())}
        )


def wav_spectrogram(sf_dir: str, *, frame: int = 256, hop: int = 128,
                    bands: int = 8, batch_size: int = 64):
    """→ (media_id, band, energy, n_frames, centroid_hz) — ``bands``
    rows per audio payload.  Rows-only by design (FFT isn't SQL);
    the numpy single-process reference is pinned in
    tests/test_multimodal.py."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows
    from .maputil import map_stage
    from .multimodal import wav_media_dataset

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({
            "media_id": pa.int64(), "band": pa.int64(),
            "energy": pa.float64(), "n_frames": pa.int64(),
            "centroid_hz": pa.float64(),
        })
    return map_stage(
        wav_media_dataset(sf_dir), SpectrogramStage,
        batch_size=batch_size,
        ctor_args=(frame, hop, bands),
    )
