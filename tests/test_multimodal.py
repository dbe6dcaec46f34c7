"""Multimodal actor-pool stages: the Ray plumbing (schema, actor signature,
batch flow) is real; the byte codec is the deterministic raw format."""

import numpy as np
import pyarrow as pa
import pytest

from pears_lite_ray.stages.multimodal import (
    DecodeAudioStage,
    DecodeImageStage,
    FrameSampleStage,
    ImageFeatureStage,
    ResizeImageStage,
    pack_audio,
    pack_image,
    pack_video,
)


def _image_table(n=20, w=32, h=24, seed=3):
    rng = np.random.RandomState(seed)
    rows = {
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(
            [pack_image(w, h, rng.randint(0, 256, size=(h, w))) for _ in range(n)],
            pa.binary(),
        ),
    }
    return pa.table(rows)


def test_decode_resize_feature_local():
    t = _image_table()
    dec = DecodeImageStage()(t)
    assert dec["width"].to_pylist() == [32] * 20
    small = ResizeImageStage(8, 8)(dec)
    assert len(small["pixels"][0].as_py()) == 64
    feats = ImageFeatureStage()(small)
    v = np.array(feats["feature"][0].as_py())
    assert v.size == 16 and abs(v.sum() - 1.0) < 1e-9


def test_decode_pipeline_on_ray(ray_session):
    import ray.data as rd

    ds = (
        rd.from_arrow(_image_table(40))
        .map_batches(DecodeImageStage, batch_format="pyarrow",
                     batch_size=8, concurrency=1, num_cpus=1)
        .map_batches(ResizeImageStage, batch_format="pyarrow",
                     fn_constructor_kwargs={"out_w": 4, "out_h": 4},
                     batch_size=8, concurrency=1, num_cpus=1)
        .map_batches(ImageFeatureStage, batch_format="pyarrow",
                     batch_size=8, concurrency=1)
    )
    out = ds.take_all()
    assert len(out) == 40
    assert all(len(r["feature"]) == 16 for r in out)


def test_frame_sample_explodes_video():
    frames = np.arange(5 * 6 * 4, dtype=np.uint8).reshape(5, 6, 4)
    t = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([pack_video(4, 6, frames)], pa.binary()),
        }
    )
    out = FrameSampleStage(stride=2)(t)
    assert out["frame_idx"].to_pylist() == [0, 2, 4]
    dec = DecodeImageStage()(out.rename_columns(["media_id", "frame_idx", "payload"]))
    img0 = np.frombuffer(dec["pixels"][0].as_py(), dtype=np.uint8).reshape(6, 4)
    assert np.array_equal(img0, frames[0])


def test_audio_summary():
    sr = 16000
    samples = (np.sin(np.linspace(0, 100, 1600)) * 1000).astype(np.int16)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([pack_audio(sr, samples)], pa.binary()),
        }
    )
    out = DecodeAudioStage()(t)
    assert out["sample_rate"][0].as_py() == sr
    assert out["n_samples"][0].as_py() == 1600
    assert out["rms"][0].as_py() == pytest.approx(
        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    )


def test_png_codec_roundtrip_gray_and_rgb_luma():
    """codec='png' is a REAL container decode (zlib inflate + unfilter):
    grayscale PNGs round-trip exactly; RGB decodes to Rec.601 integer luma."""
    from pears_lite_ray.sources.stegopng import encode_png_bytes

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(24, 32)).astype(np.uint8)
    rgb = rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["image", "image"], pa.string()),
            "payload": pa.array(
                [encode_png_bytes(gray), encode_png_bytes(rgb)], pa.binary()
            ),
        }
    )
    dec = DecodeImageStage(codec="png")(t)
    assert dec["width"].to_pylist() == [32, 5]
    assert dec["height"].to_pylist() == [24, 6]
    out_gray = np.frombuffer(dec["pixels"][0].as_py(), np.uint8).reshape(24, 32)
    assert np.array_equal(out_gray, gray)
    rgb32 = rgb.astype(np.uint32)
    luma = ((299 * rgb32[:, :, 0] + 587 * rgb32[:, :, 1]
             + 114 * rgb32[:, :, 2]) // 1000).astype(np.uint8)
    out_rgb = np.frombuffer(dec["pixels"][1].as_py(), np.uint8).reshape(6, 5)
    assert np.array_equal(out_rgb, luma)


def test_unknown_codec_rejected():
    with pytest.raises(ValueError):
        DecodeImageStage(codec="pil")


def test_wav_codec_roundtrip_and_chunk_walk():
    """pack_wav emits a canonical RIFF/WAVE container; the wav decoder
    walks chunks (extra chunk before data, odd-size padding) and rejects
    non-PCM16 formats."""
    import struct

    import numpy as np

    from pears_lite_ray.stages.multimodal import DecodeAudioStage, pack_wav

    samples = (np.arange(100, dtype=np.int16) * 17 - 800).astype(np.int16)
    wav = pack_wav(22050, samples)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([wav], pa.binary()),
        }
    )
    out = DecodeAudioStage(codec="wav")(t)
    assert out["sample_rate"].to_pylist() == [22050]
    assert out["n_samples"].to_pylist() == [100]
    exp = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    assert abs(out["rms"].to_pylist()[0] - exp) < 1e-9

    # chunk walk: LIST chunk with odd size (padded) inserted before data
    head, data_chunk = wav[:36], wav[36:]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    wav2 = (b"RIFF" + struct.pack("<I", len(head) + len(odd) + len(data_chunk) - 8)
            + head[8:] + odd + data_chunk)
    out2 = DecodeAudioStage(codec="wav")(t.set_column(
        1, "payload", pa.array([wav2], pa.binary())))
    assert out2["n_samples"].to_pylist() == [100]

    # non-PCM fmt rejected
    bad = bytearray(wav)
    bad[20] = 3  # fmt code -> IEEE float
    import pytest as _pytest

    with _pytest.raises(Exception):
        DecodeAudioStage(codec="wav")(t.set_column(
            1, "payload", pa.array([bytes(bad)], pa.binary())))
