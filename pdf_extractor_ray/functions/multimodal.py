"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Design for 100 TB: media payloads are ``large_binary`` cells that never
leave the block they were read in — every stage is an actor-pool
``map_batches`` with a SMALL batch size (payloads are big, so
batch × concurrency must fit the worker heap), and feature outputs are
tiny fixed-width columns so everything downstream of decode is cheap.

The container has no image/audio codec libraries, so payloads use a
self-describing RAW format we define (struct header + raw samples) and
decode is REAL numpy work, not a mock:

- image: ``IMGR`` magic, uint16 width/height, uint8 channels, then
  ``h*w*c`` uint8 pixels
- audio: ``AUDR`` magic, uint32 sample_rate, uint32 n_samples, then
  int16 PCM samples
- video: ``VIDR`` magic, uint16 width/height, uint8 channels,
  uint16 n_frames, then ``f*h*w*c`` uint8 pixels

Real-world codecs (JPEG/PNG via PIL, PCM via soundfile, mp4 via
ffmpeg) plug into ``decode_external`` — a clearly-marked stub that
raises ``NotImplementedError`` unless the optional import succeeds;
the Ray-side plumbing (schema, actor signature, batch sizing, output
layout) is identical and fully exercised by the RAW path.

Payload geometry is a pure function of ``media_id`` (simple modular
arithmetic) so the metadata queries stay SQL-oracle-checkable against
the ``documents`` table the media table derives from.

Reference parity note: the reference treats a PDF as one opaque binary
handled by a stateful extractor (extractor/extractors/
pdf_text_extractor.py:58-217); these stages generalize that shape to
image/audio/video payload columns.
"""
from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .pool import pool_size

# deterministic geometry (keep in sync with oracle_sql in __ray_entry__):
#   kind       = media_id % 3  (0=image, 1=audio, 2=video)
#   image: width = 16 + (media_id % 8) * 4, height = 12 + (media_id % 5) * 4,
#          channels = 3
#   audio: sample_rate = 8000, n_samples = 400 + (media_id % 50) * 16
#   video: width = 16, height = 12, channels = 3,
#          n_frames = 4 + media_id % 13
_KINDS = ("image", "audio", "video")


def _rng_bytes(media_id: int, n: int) -> np.ndarray:
    """Deterministic per-id byte stream (seeded PCG64 — cheap, stable)."""
    return np.random.default_rng(media_id).integers(0, 256, size=n, dtype=np.uint8)


def _geometry(media_id: int) -> Tuple[str, dict]:
    kind = _KINDS[media_id % 3]
    if kind == "image":
        return kind, {
            "width": 16 + (media_id % 8) * 4,
            "height": 12 + (media_id % 5) * 4,
            "channels": 3,
        }
    if kind == "audio":
        return kind, {"sample_rate": 8000, "n_samples": 400 + (media_id % 50) * 16}
    return kind, {"width": 16, "height": 12, "channels": 3, "n_frames": 4 + media_id % 13}


def _image_pixels(media_id: int, n: int) -> np.ndarray:
    """Image pixel content — with PLANTED near-duplicates: images whose
    id sits in an odd 240-block at offset ≡ 0 (mod 15) reuse the pixels
    of the image 240 ids earlier (identical geometry: 240 ≡ 0 mod the
    8/5/3 geometry moduli) with ~0.5% of bytes perturbed — the
    re-encoded-thumbnail case image near-dup detection exists for."""
    blk, off = media_id // 240, media_id % 240
    if blk % 2 == 1 and off % 15 == 0:
        px = _rng_bytes(media_id - 240, n).copy()
        noise = np.random.default_rng(media_id ^ 0xA5A5).integers(
            0, n, size=max(1, n // 200)
        )
        px[noise] ^= 0x80
        return px
    return _rng_bytes(media_id, n)


def _build_payload(media_id: int) -> Tuple[str, bytes, dict]:
    kind, g = _geometry(media_id)
    if kind == "image":
        n = g["width"] * g["height"] * g["channels"]
        head = b"IMGR" + struct.pack("<HHB", g["width"], g["height"], g["channels"])
        return kind, head + _image_pixels(media_id, n).tobytes(), g
    if kind == "audio":
        head = b"AUDR" + struct.pack("<II", g["sample_rate"], g["n_samples"])
        pcm = (_rng_bytes(media_id, g["n_samples"] * 2).view(np.int16)).tobytes()
        return kind, head + pcm, g
    n = g["n_frames"] * g["width"] * g["height"] * g["channels"]
    head = b"VIDR" + struct.pack(
        "<HHBH", g["width"], g["height"], g["channels"], g["n_frames"]
    )
    return kind, head + _rng_bytes(media_id, n).tobytes(), g


class MediaSynthesizer:
    """documents batch → media batch ``(media_id, kind, payload, width,
    height, channels, sample_rate, n_samples, n_frames)``.

    Streams as ``map_batches`` so corpus synthesis scales with the
    cluster exactly like the pages corpus (sources/corpus.py).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        kinds, payloads = [], []
        meta = {k: [] for k in ("width", "height", "channels", "sample_rate", "n_samples", "n_frames")}
        for media_id in ids:
            kind, payload, g = _build_payload(media_id)
            kinds.append(kind)
            payloads.append(payload)
            for k in meta:
                meta[k].append(g.get(k))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.large_binary()),
                **{k: pa.array(v, pa.int32()) for k, v in meta.items()},
            }
        )


def media_dataset(sf_dir: str, batch_size: int = 64):
    """documents.parquet → streaming media Dataset (column-pruned read)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        MediaSynthesizer(), batch_format="pyarrow", batch_size=batch_size
    )


# ---------------------------------------------------------------- decoders
def decode_image(payload: bytes) -> np.ndarray:
    if payload[:4] != b"IMGR":
        return decode_external("image", payload)
    w, h, c = struct.unpack("<HHB", payload[4:9])
    return np.frombuffer(payload, np.uint8, count=h * w * c, offset=9).reshape(h, w, c)


def decode_audio(payload: bytes) -> Tuple[np.ndarray, int]:
    if payload[:4] != b"AUDR":
        return decode_external("audio", payload)
    rate, n = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload, np.int16, count=n, offset=12), rate


def decode_video(payload: bytes) -> np.ndarray:
    if payload[:4] != b"VIDR":
        return decode_external("video", payload)
    w, h, c, f = struct.unpack("<HHBH", payload[4:11])
    return np.frombuffer(payload, np.uint8, count=f * h * w * c, offset=11).reshape(f, h, w, c)


def decode_external(kind: str, payload: bytes):
    """STUB: real-codec decode (JPEG/PNG/PCM-WAV/mp4).

    The sandbox ships no media libraries; in production this is where
    PIL / soundfile / pyav plug in. The surrounding Ray plumbing
    (actor stages, schemas, batch sizing) is identical for real codecs.
    """
    try:  # pragma: no cover - libraries absent in this container
        if kind == "image":
            import io

            from PIL import Image  # noqa: F401

            return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        pass
    raise NotImplementedError(
        f"no external {kind} codec available in this environment; "
        "payload is not in the RAW container format"
    )


# ------------------------------------------------------------------ stages
class ImageFeatureStage:
    """media batch (images) → per-channel mean/std + luma histogram.

    Actor-pool stage: decode + feature-extract per batch; output is a
    narrow numeric table (payload column is dropped — features travel,
    pixels don't).
    """

    HIST_BINS = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, stds, hists = [], [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            img = decode_image(payload)
            flat = img.reshape(-1, img.shape[2]).astype(np.float64)
            means.append([round(x, 6) for x in flat.mean(axis=0)])
            stds.append([round(x, 6) for x in flat.std(axis=0)])
            luma = flat.mean(axis=1)
            hist, _ = np.histogram(luma, bins=self.HIST_BINS, range=(0, 256))
            hists.append([int(x) for x in hist])
            ids.append(media_id)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "channel_mean": pa.array(means, pa.list_(pa.float64())),
                "channel_std": pa.array(stds, pa.list_(pa.float64())),
                "luma_hist": pa.array(hists, pa.list_(pa.int64())),
            }
        )


class ImageResizeStage:
    """media batch (images) → resized RAW payloads (nearest-neighbor).

    Payload-in/payload-out: output stays ``large_binary`` in the same
    container format so stages compose.
    """

    def __init__(self, width: int = 8, height: int = 8) -> None:
        self.w, self.h = width, height

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        ys = (np.arange(self.h) * h // self.h).clip(0, h - 1)
        xs = (np.arange(self.w) * w // self.w).clip(0, w - 1)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            img = self._resize(decode_image(payload))
            head = b"IMGR" + struct.pack("<HHB", img.shape[1], img.shape[0], img.shape[2])
            ids.append(media_id)
            payloads.append(head + img.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.large_binary()),
                "width": pa.array([self.w] * len(ids), pa.int32()),
                "height": pa.array([self.h] * len(ids), pa.int32()),
            }
        )


class AudioFeatureStage:
    """media batch (audio) → rms / zero-crossing-rate / duration_ms."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rms, zcr, dur = [], [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            samples, rate = decode_audio(payload)
            x = samples.astype(np.float64)
            ids.append(media_id)
            rms.append(round(float(np.sqrt(np.mean(x * x))), 6))
            zcr.append(round(float(np.mean(np.diff(np.signbit(samples)) != 0)), 6))
            dur.append(round(len(samples) * 1000.0 / rate, 3))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossing_rate": pa.array(zcr, pa.float64()),
                "duration_ms": pa.array(dur, pa.float64()),
            }
        )


class VideoFrameSampleStage:
    """media batch (video) → one row per sampled frame (every ``stride``-th),
    frames re-encoded as RAW image payloads — the frame-sampling shape a
    training pipeline uses before per-frame featurization."""

    def __init__(self, stride: int = 4) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, payloads = [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            vid = decode_video(payload)
            for i in range(0, vid.shape[0], self.stride):
                frame = vid[i]
                head = b"IMGR" + struct.pack(
                    "<HHB", frame.shape[1], frame.shape[0], frame.shape[2]
                )
                ids.append(media_id)
                frame_idx.append(i)
                payloads.append(head + frame.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "payload": pa.array(payloads, pa.large_binary()),
            }
        )


class KeyframeStage:
    """media batch (video) → one row per KEYFRAME: frames whose mean
    absolute pixel difference from the previously-KEPT frame exceeds
    ``threshold`` (frame 0 always kept) — shot-change detection, the
    content-aware alternative to fixed-stride sampling.  Fully
    vectorized per video (one int16 diff over the frame tensor);
    emits (media_id, frame_idx, diff:float64, payload RAW image)."""

    def __init__(self, threshold: float = 8.0) -> None:
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, diffs, payloads = [], [], [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            vid = decode_video(payload).astype(np.int16)
            last_kept = None
            for i in range(vid.shape[0]):
                if last_kept is None:
                    d = float("inf")
                else:
                    d = float(np.abs(vid[i] - last_kept).mean())
                if last_kept is None or d >= self.threshold:
                    frame = vid[i].astype(np.uint8)
                    head = b"IMGR" + struct.pack(
                        "<HHB", frame.shape[1], frame.shape[0], frame.shape[2]
                    )
                    ids.append(media_id)
                    frame_idx.append(i)
                    diffs.append(0.0 if last_kept is None else round(d, 6))
                    payloads.append(head + frame.tobytes())
                    last_kept = vid[i]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "diff": pa.array(diffs, pa.float64()),
                "payload": pa.array(payloads, pa.large_binary()),
            }
        )


# ---------------------------------------------------------------- pipelines
def image_features(sf_dir: str, concurrency=None, batch_size: int = 32):
    concurrency = concurrency or pool_size()
    ds = media_dataset(sf_dir)
    return ds.filter(expr="kind == 'image'").map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features(sf_dir: str, concurrency=None, batch_size: int = 32):
    concurrency = concurrency or pool_size()
    ds = media_dataset(sf_dir)
    return ds.filter(expr="kind == 'audio'").map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def video_frames(sf_dir: str, stride: int = 4, concurrency=None, batch_size: int = 16):
    concurrency = concurrency or pool_size()
    ds = media_dataset(sf_dir)
    return ds.filter(expr="kind == 'video'").map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_meta_stats(sf_dir: str):
    """Per-kind payload accounting — SQL-oracle-checkable because the
    geometry is pure modular arithmetic on media_id (== doc_id).
    Three groups → partial aggregation (functions/agg.py), no shuffle."""
    import pyarrow.compute as pc

    from .agg import lowcard_groupby_agg

    ds = media_dataset(sf_dir)

    def nbytes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": batch.column("kind"),
                "payload_bytes": pc.cast(
                    pc.binary_length(batch.column("payload")), pa.int64()
                ),
            }
        )

    return lowcard_groupby_agg(
        ds.map_batches(nbytes, batch_format="pyarrow"),
        ["kind"],
        [
            ("payload_bytes", "count", "n_media"),
            ("payload_bytes", "sum", "total_bytes"),
        ],
    )


# ------------------------------------------------------- image near-dup
def average_hash(img: np.ndarray) -> int:
    """64-bit perceptual average-hash: grayscale → 8×8 sample grid →
    bit = sample > grid mean. Robust to small pixel perturbations;
    Hamming distance between hashes ≈ visual difference."""
    g = img.astype(np.float64).mean(axis=2)
    ys = np.linspace(0, g.shape[0] - 1, 8).astype(int)
    xs = np.linspace(0, g.shape[1] - 1, 8).astype(int)
    s = g[np.ix_(ys, xs)]
    bits = (s > s.mean()).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class ImagePhashStage:
    """image batch → (media_id, simhash): the 64-bit perceptual hash
    per image. Candidate buckets come from the shared pigeonhole
    banding (``functions/dedup.hamming_bands`` — at Hamming ≤ 3 that is
    four disjoint 16-bit bands, candidate recall exactly 1.0). Only
    (id, sig) rows leave this stage; pixels stay in their block.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, sigs_out = [], []
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            ids_out.append(media_id)
            sigs_out.append(average_hash(decode_image(payload)) & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "simhash": pa.array(sigs_out, pa.int64()),
            }
        )


def image_near_dups(sf_dir: str, max_hamming: int = 3):
    """Near-duplicate image pairs by perceptual hash — multimodal dedup
    on the same pigeonhole banding + collision-first Hamming-bucket
    machinery as text SimHash (functions/dedup.hamming_bands /
    hamming_bucket_pairs); pair dedup across bands happens inside."""
    from .dedup import hamming_bands, hamming_bucket_pairs

    images = media_dataset(sf_dir).filter(expr="kind == 'image'")
    sigs = images.map_batches(
        ImagePhashStage,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool_size(),
    )
    return hamming_bucket_pairs(
        hamming_bands(sigs, max_hamming, id_col="media_id"),
        max_hamming=max_hamming,
        id_col="media_id", out_a="media_a", out_b="media_b",
    )
