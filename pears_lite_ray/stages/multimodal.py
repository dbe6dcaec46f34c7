"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool
``map_batches`` stages.

The heavyweight decode libraries (PIL/ffmpeg/soundfile) are NOT in this
environment, so the byte-level decode is pluggable:

* ``codec="raw"`` — a deterministic packed format (tests + plumbing):
  ``b"IMG1" + uint16 w + uint16 h + w*h gray bytes`` for images,
  ``b"AUD1" + uint32 sr + int16 samples`` for audio,
  ``b"VID1" + uint16 w,h + uint16 n_frames + frames`` for video.
* ``codec="png"`` (images; the driver entry's codec) — a REAL container
  decode: the
  pure-Python PNG reader shared with the stego source
  (sources/stegopng.py: zlib inflate + scanline unfilter, 8-bit
  gray/RGB/RGBA); color decodes to Rec.601 integer luma.
* ``codec="wav"`` (audio; the driver entry's codec) — a REAL RIFF/WAVE
  chunk-walk parser (PCM16 mono, fmt validated, even-byte chunk padding).
  Video has no pure-Python container worth faking; it stays ``raw``.

Scale notes: payloads are large → callers should pass a SMALL
``batch_size`` (payload bytes × batch_size × concurrency must fit the
worker heap); the stages never hold more than one batch.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),      # "image" | "audio" | "video"
        ("payload", pa.binary()),
    ]
)

DECODED_IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("pixels", pa.binary()),    # row-major grayscale
    ]
)


def pack_image(w: int, h: int, pixels: np.ndarray) -> bytes:
    return b"IMG1" + struct.pack("<HH", w, h) + pixels.astype(np.uint8).tobytes()


def pack_audio(sr: int, samples: np.ndarray) -> bytes:
    return b"AUD1" + struct.pack("<I", sr) + samples.astype(np.int16).tobytes()


def pack_wav(sr: int, samples: np.ndarray) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE container (PCM16 mono) — the
    real audio container the wav codec path decodes."""
    data = samples.astype("<i2").tobytes()
    return b"".join(
        [
            b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
            b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16),
            b"data", struct.pack("<I", len(data)), data,
        ]
    )


def pack_video(w: int, h: int, frames: np.ndarray) -> bytes:
    n = frames.shape[0]
    return (b"VID1" + struct.pack("<HHH", w, h, n)
            + frames.astype(np.uint8).tobytes())


class DecodeImageStage:
    """payload → (width, height, pixels). Stateful: the codec handle is
    opened once per actor in ``__init__`` (for real codecs this is the
    library/model load)."""

    def __init__(self, codec: str = "raw"):
        if codec == "raw":
            self._decode = self._decode_raw
        elif codec == "png":
            self._decode = self._decode_png
        else:
            raise ValueError(f"unknown codec {codec}")

    @staticmethod
    def _decode_raw(payload: bytes) -> tuple[int, int, bytes]:
        if payload[:4] != b"IMG1":
            raise ValueError("not an IMG1 payload")
        w, h = struct.unpack_from("<HH", payload, 4)
        pix = payload[8:8 + w * h]
        if len(pix) != w * h:
            raise ValueError("truncated image payload")
        return w, h, pix

    @staticmethod
    def _decode_png(payload: bytes) -> tuple[int, int, bytes]:
        from ..sources.stegopng import read_png_pixels_bytes

        px = read_png_pixels_bytes(payload)
        h, w, ch = px.shape
        if ch == 1:
            gray = px[:, :, 0]
        else:  # RGB(A) → Rec.601 integer luma, alpha ignored
            rgb = px[:, :, :3].astype(np.uint32)
            gray = ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1]
                     + 114 * rgb[:, :, 2]) // 1000).astype(np.uint8)
        return w, h, gray.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, px = [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, pix = self._decode(payload)
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            px.append(pix)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(px, pa.binary()),
            ],
            schema=DECODED_IMAGE_SCHEMA,
        )


class ResizeImageStage:
    """Nearest-neighbor resize to (out_w, out_h) — vectorized index gather
    per image; the per-actor state is just the target geometry."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_px = []
        for w, h, pix in zip(
            batch["width"].to_pylist(), batch["height"].to_pylist(),
            batch["pixels"].to_pylist(),
        ):
            img = np.frombuffer(pix, dtype=np.uint8).reshape(h, w)
            ys = (np.arange(self.out_h) * h) // self.out_h
            xs = (np.arange(self.out_w) * w) // self.out_w
            out_px.append(img[np.ix_(ys, xs)].tobytes())
        return pa.Table.from_arrays(
            [
                batch["media_id"],
                pa.array([self.out_w] * len(batch), pa.int32()),
                pa.array([self.out_h] * len(batch), pa.int32()),
                pa.array(out_px, pa.binary()),
            ],
            schema=DECODED_IMAGE_SCHEMA,
        )


class ImageFeatureStage:
    """Decoded image → feature vector (16-bin intensity histogram, L1
    normalized) — the batched-model-inference shape: one numpy pass per
    batch, output a fixed-width ``list<float>`` column."""

    BINS = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for pix in batch["pixels"].to_pylist():
            arr = np.frombuffer(pix, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=self.BINS).astype(np.float64)
            feats.append((hist / max(arr.size, 1)).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """VID1 payload → every ``stride``-th frame as an IMG1 row (flat_map
    shape: one input row → n output rows)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, payloads = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if payload[:4] != b"VID1":
                raise ValueError("not a VID1 payload")
            w, h, n = struct.unpack_from("<HHH", payload, 4)
            frames = np.frombuffer(
                payload, dtype=np.uint8, count=w * h * n, offset=10
            ).reshape(n, h, w)
            for i in range(0, n, self.stride):
                ids.append(mid)
                fidx.append(i)
                payloads.append(pack_image(w, h, frames[i]))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


class DecodeAudioStage:
    """payload → (sample_rate, n_samples, rms) summary row. Codecs:
    ``raw`` (AUD1 test format) or ``wav`` — a REAL RIFF/WAVE chunk-walk
    parser (PCM16 mono; fmt validated, chunk padding honored)."""

    def __init__(self, codec: str = "raw"):
        if codec == "raw":
            self._decode = self._decode_raw
        elif codec == "wav":
            self._decode = self._decode_wav
        else:
            raise ValueError(f"unknown codec {codec}")

    @staticmethod
    def _decode_raw(payload: bytes) -> tuple[int, np.ndarray]:
        if payload[:4] != b"AUD1":
            raise ValueError("not an AUD1 payload")
        (sr,) = struct.unpack_from("<I", payload, 4)
        return sr, np.frombuffer(payload, dtype=np.int16, offset=8)

    @staticmethod
    def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        sr, samples, off = None, None, 12
        while off + 8 <= len(payload):
            cid = payload[off:off + 4]
            (size,) = struct.unpack_from("<I", payload, off + 4)
            body = off + 8
            if cid == b"fmt ":
                fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", payload, body
                )
                if fmt != 1 or ch != 1 or bits != 16:
                    raise ValueError(
                        f"unsupported WAVE format (fmt={fmt} ch={ch} bits={bits})"
                    )
                sr = rate
            elif cid == b"data":
                samples = np.frombuffer(payload, dtype="<i2", offset=body,
                                        count=size // 2)
            off = body + size + (size & 1)  # RIFF chunks pad to even
        if sr is None or samples is None:
            raise ValueError("WAVE missing fmt/data chunk")
        return sr, samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        srs, ns, rms = [], [], []
        for payload in batch["payload"].to_pylist():
            sr, samples = self._decode(payload)
            srs.append(sr)
            ns.append(samples.size)
            rms.append(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                       if samples.size else 0.0)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(srs, pa.int32()),
                "n_samples": pa.array(ns, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
            }
        )
