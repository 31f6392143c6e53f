"""Multimodal stage tests: payload synthesis determinism, byte-level
decode correctness, stub gating, and Ray plumbing (schema + actor
signature)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from outbreak_kg_ray.stages import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_payload_roundtrip_image():
    payload = mm.make_image_payload(7)
    w, h = mm.image_dims(7)
    assert payload[:4] == b"FIMG"
    assert len(payload) == 8 + w * h
    out = mm.ImageDecodeStage()(
        pa.table({"media_id": [14], "payload": [payload]})
    )
    row = out.to_pylist()[0]
    assert (row["width"], row["height"]) == (w, h)
    assert row["f_first"] == float((7 * 131) % 256)
    assert row["f_last"] == float((7 * 131 + (w * h - 1) * 29) % 256)
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=8)
    assert row["f_mean"] == round(float(pixels.mean()), 6)


def test_payload_roundtrip_audio_stride():
    payload = mm.make_audio_payload(11)
    sr, n = mm.audio_params(11)
    out = mm.AudioFrameSampleStage(stride=4)(
        pa.table({"media_id": [23], "payload": [payload]})
    )
    row = out.to_pylist()[0]
    assert row["sample_rate"] == sr
    assert row["n_frames"] == (n + 3) // 4
    samples = np.frombuffer(payload, dtype=np.uint8, offset=8)
    assert row["frame_mean"] == round(float(samples[::4].mean()), 6)


def test_non_png_real_decode_is_stubbed():
    # JPEG (no PIL in this container) stays a guarded stub; malformed
    # RIFF is a hard error, compressed audio a stub
    with pytest.raises(NotImplementedError):
        mm.ImageDecodeStage()(
            pa.table({"media_id": [0], "payload": [b"\xff\xd8\xff jpeg"]})
        )
    with pytest.raises(ValueError):
        mm.AudioFrameSampleStage()(
            pa.table({"media_id": [0], "payload": [b"RIFF fake wav"]})
        )
    with pytest.raises(NotImplementedError):
        mm.AudioFrameSampleStage()(
            pa.table({"media_id": [0], "payload": [b"OggS vorbis..."]})
        )


def test_png_roundtrip_all_filters():
    import numpy as np
    import zlib

    for doc_id in (0, 3, 11, 250):
        w, h = mm.image_dims(doc_id)
        idx = np.arange(w * h, dtype=np.int64)
        expect = ((doc_id * 131 + idx * 29) % 256).astype(
            np.uint8
        ).reshape(h, w)
        payload = mm.make_png_payload(doc_id)
        assert payload.startswith(mm.PNG_SIG)
        dw, dh, pix = mm.decode_png(payload)
        assert (dw, dh) == (w, h)
        assert (pix == expect).all()
        # the encoder cycles filter = y % 5, so a >=5-row image
        # exercises ALL five scanline filters in the decoder
        raw = zlib.decompress(
            payload[payload.index(b"IDAT") + 4:-16]
        )
        ftypes = {raw[y * (w + 1)] for y in range(h)}
        assert ftypes == {0, 1, 2, 3, 4}


def test_png_crc_corruption_rejected():
    payload = bytearray(mm.make_png_payload(5))
    payload[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(payload))


def test_wav_cross_implementation_roundtrip():
    import numpy as np

    # stdlib `wave` encoder × hand-written RIFF decoder
    for doc_id in (0, 1, 2, 77):
        sr, n = mm.audio_params(doc_id)
        idx = np.arange(n, dtype=np.int64)
        expect = (((doc_id * 37 + idx * 11) % 65536) - 32768).astype(
            np.int16
        )
        dsr, samples = mm.decode_wav(mm.make_wav_payload(doc_id))
        assert dsr == sr
        assert (samples == expect).all()


def test_real_codec_pipelines(ray_session):
    import numpy as np

    feats = mm.png_image_features(SF).to_pandas()
    assert len(feats) == 500
    # spot-check one decoded row against the closed form
    row = feats[feats["media_id"] == 7].iloc[0]
    w, h = mm.image_dims(7)
    idx = np.arange(w * h, dtype=np.int64)
    px = (7 * 131 + idx * 29) % 256
    assert (row["width"], row["height"]) == (w, h)
    assert row["f_mean"] == pytest.approx(px.mean(), abs=1e-6)
    wavs = mm.wav_audio_frames(SF).to_pandas()
    assert len(wavs) == 500
    assert set(wavs["sample_rate"]) <= {8000, 12000, 16000}
    # PCM-16 means are signed
    assert (wavs["frame_mean"].abs() <= 32768).all()


def test_media_dataset_plumbing(ray_session):
    ds = mm.media_dataset(SF)
    assert set(ds.schema().names) == {"media_id", "kind", "payload"}
    feats = mm.image_features(SF)
    df = feats.to_pandas()
    assert len(df) == 500  # one image per document
    assert set(df.columns) == {
        "media_id", "width", "height", "n_bytes", "f_first", "f_last", "f_mean"
    }
    # spot-check a row against the closed-form payload formulas
    row = df[df.media_id == 10].iloc[0]
    w, h = mm.image_dims(5)
    assert (row["width"], row["height"]) == (w, h)
    assert row["n_bytes"] == 8 + w * h

    frames = mm.audio_frames(SF).to_pandas()
    assert len(frames) == 500
    assert (frames["n_frames"] > 0).all()


def test_video_payload_roundtrip():
    """FVID byte layout parses back to the synthesis formula."""
    import numpy as np

    payload = mm.make_video_payload(7)
    w, h, nf = mm.video_params(7)
    out = mm.VideoFrameSampleStage(stride=2)(
        pa.table(
            {
                "media_id": pa.array([7], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
    )
    row = out.to_pylist()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (w, h, nf)
    assert row["n_sampled"] == (nf + 1) // 2
    # brute-force expected mean over sampled planes
    vals = [
        (7 * 17 + f * 53 + i * 29) % 256
        for f in range(0, nf, 2)
        for i in range(w * h)
    ]
    assert abs(row["sampled_mean"] - np.mean(vals)) < 1e-6


def test_image_resize_nearest_neighbor():
    import numpy as np

    payload = mm.make_image_payload(3)
    w, h = mm.image_dims(3)
    out = mm.ImageResizeStage(size=8)(
        pa.table(
            {
                "media_id": pa.array([6], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
    ).to_pylist()[0]
    pixels = np.array(
        [(3 * 131 + i * 29) % 256 for i in range(w * h)]
    ).reshape(h, w)
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(8) * w) // 8
    thumb = pixels[rows][:, cols]
    assert out["top_left"] == float(thumb[0, 0])
    assert abs(out["thumb_mean"] - thumb.mean()) < 1e-6


def test_video_pipeline_plumbing(ray_session):
    df = mm.video_frame_samples(SF).to_pandas()
    assert len(df) == 500
    assert (df["n_sampled"] >= 2).all()
    thumbs = mm.image_thumbnails(SF).to_pandas()
    assert len(thumbs) == 500
    assert (thumbs["thumb_w"] == 8).all()


def test_wav_spectrogram_matches_numpy(sf_dir):
    """Distributed spectrogram stage == direct numpy reference over
    the same deterministic WAV payloads; band energies cover the
    full power spectrum (sum of band means ~ total mean power)."""
    import numpy as np

    from outbreak_kg_ray.stages import dsp
    from outbreak_kg_ray.stages.multimodal import make_wav_payload

    got = dsp.wav_spectrogram(sf_dir).to_pandas()
    assert (got.groupby("media_id")["band"].count() == 8).all()
    for mid in list(got["media_id"].unique())[:20]:
        n_frames, energies, centroid = dsp.spectrogram_features(
            make_wav_payload(int(mid))
        )
        sub = got[got["media_id"] == mid].sort_values("band")
        assert (sub["n_frames"] == n_frames).all()
        assert np.allclose(sub["energy"], np.round(energies, 4))
        assert np.allclose(sub["centroid_hz"], round(centroid, 4))


def test_png_image_augments_pixel_exact(sf_dir):
    """Crop stats equal the analytic formula applied to the decoded
    matrix; the crop is a real sub-slice (first/last pixels differ
    across flips for asymmetric content)."""
    from outbreak_kg_ray.stages import multimodal as mm

    rows = mm.png_image_augments(sf_dir).take_all()
    assert rows
    for r in rows[:100]:
        mid = r["media_id"]
        w, h = mm.image_dims(mid)
        assert r["crop_w"] == max(8, w // 2)
        assert r["crop_h"] == max(8, h // 2)
        assert 0 <= r["x0"] <= w - r["crop_w"]
        assert 0 <= r["y0"] <= h - r["crop_h"]
        assert r["flipped"] == (mid % 2 == 1)

        def px(y, x):
            return float((mid * 131 + (y * w + x) * 29) % 256)

        x_first = r["x0"] + r["crop_w"] - 1 if r["flipped"] else r["x0"]
        x_last = r["x0"] if r["flipped"] else r["x0"] + r["crop_w"] - 1
        assert r["c_first"] == px(r["y0"], x_first)
        assert r["c_last"] == px(r["y0"] + r["crop_h"] - 1, x_last)
        total = sum(
            px(y, x)
            for y in range(r["y0"], r["y0"] + r["crop_h"])
            for x in range(r["x0"], r["x0"] + r["crop_w"])
        )
        mean = total / (r["crop_w"] * r["crop_h"])
        assert abs(r["c_mean"] - mean) < 1e-6


def test_wav_audio_augments_sample_exact(sf_dir):
    """Shift/invert stats equal the analytic int16 formula."""
    from outbreak_kg_ray.stages import multimodal as mm

    rows = mm.wav_audio_augments(sf_dir).take_all()
    assert rows
    for r in rows[:100]:
        mid = r["media_id"]
        sr, n = mm.audio_params(mid)
        assert (r["sample_rate"], r["n_samples"]) == (sr, n)
        assert r["shift"] == (mid * 19) % n
        assert r["inverted"] == (mid % 2 == 1)
        sgn = -1 if r["inverted"] else 1

        def s16(i):
            return ((mid * 37 + i * 11) % 65536) - 32768

        assert r["a_first"] == sgn * s16(r["shift"])
        assert r["a_last"] == sgn * s16((r["shift"] + n - 1) % n)
        mean = sgn * sum(s16(i) for i in range(n)) / n
        assert abs(r["a_mean"] - mean) < 1e-6
