"""Multimodal stages: RAW decode round-trips, feature/resize/frame
stages over Ray, and geometry parity with the SQL-oracle formulas."""
from __future__ import annotations

import numpy as np
import pytest

from pdf_extractor_ray.functions.multimodal import (
    AudioFeatureStage,
    ImageFeatureStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    _build_payload,
    decode_audio,
    decode_external,
    decode_image,
    decode_video,
    media_dataset,
)


def test_raw_roundtrip_image():
    kind, payload, g = _build_payload(0)  # 0 % 3 == 0 → image
    assert kind == "image"
    img = decode_image(payload)
    assert img.shape == (g["height"], g["width"], g["channels"])
    # deterministic: same id → same pixels
    assert np.array_equal(img, decode_image(_build_payload(0)[1]))


def test_raw_roundtrip_audio():
    kind, payload, g = _build_payload(1)
    assert kind == "audio"
    samples, rate = decode_audio(payload)
    assert rate == g["sample_rate"] and len(samples) == g["n_samples"]


def test_raw_roundtrip_video():
    kind, payload, g = _build_payload(2)
    assert kind == "video"
    vid = decode_video(payload)
    assert vid.shape == (g["n_frames"], g["height"], g["width"], g["channels"])


def test_external_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_external("image", b"\x89PNG....")


def test_resize_stage_composes_with_decode():
    import pyarrow as pa

    _, payload, _ = _build_payload(3)
    batch = pa.table(
        {"media_id": pa.array([3], pa.int64()), "payload": pa.array([payload], pa.large_binary())}
    )
    out = ImageResizeStage(width=4, height=4)(batch)
    resized = decode_image(out.column("payload").to_pylist()[0])
    assert resized.shape == (4, 4, 3)


def test_frame_sample_stride():
    import pyarrow as pa

    _, payload, g = _build_payload(5)  # video
    batch = pa.table(
        {"media_id": pa.array([5], pa.int64()), "payload": pa.array([payload], pa.large_binary())}
    )
    out = VideoFrameSampleStage(stride=4)(batch)
    want = len(range(0, g["n_frames"], 4))
    assert out.num_rows == want
    frame = decode_image(out.column("payload").to_pylist()[0])
    assert frame.shape == (g["height"], g["width"], g["channels"])
    # sampled frame 0 equals the decoded video's frame 0
    assert np.array_equal(frame, decode_video(payload)[0])


def test_media_pipeline_end_to_end(ray_session, sf_dir):
    from pdf_extractor_ray.functions.multimodal import (
        audio_features,
        image_features,
        media_meta_stats,
        video_frames,
    )

    stats = media_meta_stats(sf_dir).to_pandas()
    assert set(stats["kind"]) == {"image", "audio", "video"}
    assert int(stats["n_media"].sum()) == 500

    img = image_features(sf_dir).to_pandas()
    assert len(img) == len(media_dataset(sf_dir).filter(expr="kind == 'image'").to_pandas())
    assert all(len(m) == 3 for m in img["channel_mean"])
    assert all(len(h) == ImageFeatureStage.HIST_BINS for h in img["luma_hist"])

    aud = audio_features(sf_dir).to_pandas()
    assert (aud["rms"] > 0).all()
    assert (aud["duration_ms"] > 0).all()

    vf = video_frames(sf_dir, stride=4).to_pandas()
    assert (vf["frame_idx"] % 4 == 0).all()
    assert vf["media_id"].nunique() > 0


def test_image_phash_finds_planted_near_dups(ray_session, sf_dir):
    """The synthesizer plants near-dup images ((i, i+240) for i % 15 == 0
    with ~0.5% pixel noise); perceptual-hash dedup must find exactly
    those pairs — no false positives among the ~14k random pairs."""
    from pdf_extractor_ray.functions.multimodal import image_near_dups

    found = image_near_dups(sf_dir, max_hamming=3).to_pandas()
    got = set(zip(found["media_a"], found["media_b"]))
    want = {(i, i + 240) for i in range(0, 240, 15) if (i + 240) < 500}
    assert got == want
    assert (found["hamming"] <= 3).all()


def test_average_hash_stability():
    """average_hash is deterministic and robust to sub-1% perturbation,
    while distinct random images stay far apart."""
    import numpy as np

    from pdf_extractor_ray.functions.multimodal import average_hash

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    h1 = average_hash(img)
    assert h1 == average_hash(img.copy())
    noisy = img.copy()
    idx = rng.integers(0, noisy.size, size=noisy.size // 200)
    noisy.ravel()[idx] ^= 0x80
    d_noise = bin(h1 ^ average_hash(noisy)).count("1")
    other = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    d_other = bin(h1 ^ average_hash(other)).count("1")
    assert d_noise <= 3 < d_other


def test_keyframe_stage_detects_shot_changes(ray_session):
    """Static runs collapse to one keyframe; scene jumps are kept."""
    import struct

    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_extractor_ray.functions.multimodal import KeyframeStage

    w = h = c = 4
    scenes = [0, 0, 0, 200, 200, 90, 90, 90, 90]  # 3 shots
    frames = np.stack([
        np.full((h, w, c), v, dtype=np.uint8) for v in scenes
    ])
    payload = (b"VIDR" + struct.pack("<HHBH", w, h, c, len(scenes))
               + frames.tobytes())
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.large_binary()),
    })
    out = KeyframeStage(threshold=8.0)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 3, 5]
    diffs = out.column("diff").to_pylist()
    assert diffs[0] == 0.0 and diffs[1] == 200.0 and diffs[2] == 110.0
