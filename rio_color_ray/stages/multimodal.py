"""Multimodal column stages — real Ray plumbing, stubbed codecs.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns beside them (the same layout as the tiles table). The
actor-pool stage shape — schema in/out, batch sizing for large binary
rows, per-actor model/codec initialisation — is real and tested; the
codec itself is either a clearly-marked NotImplementedError (real
decode: no imaging/audio libraries exist in this environment) or a
DETERMINISTIC FAKE decode used to exercise the pipeline end-to-end.

Batch-size guidance (ray_guide "Memory-aware"): with payloads of
``P`` bytes, pick ``batch_size`` so ``batch_size * P * concurrency``
fits the worker heap — callers pass small batch sizes (e.g. 16-64) for
megabyte-scale media.
"""

import hashlib

import numpy as np
import pyarrow as pa


class DecodeImageStage:
    """Decode image bytes -> (h, w, 3) uint8 + feature columns.

    ``fake=True`` (default here): deterministic pseudo-decode — pixels
    derived from a SHA-256 keystream of the payload, so tests exercise
    the full actor/schema/batch path with stable outputs. ``fake=False``
    raises NotImplementedError (no PIL/libjpeg in this container).
    """

    def __init__(self, out_size=(16, 16), fake=True):
        self.out_size = out_size
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires an imaging library (PIL/opencv), "
                "not present in this environment — run with fake=True"
            )
        h, w = self.out_size
        n = h * w * 3
        stream = bytearray()
        seed = hashlib.sha256(payload).digest()
        block = seed
        while len(stream) < n:
            block = hashlib.sha256(block).digest()
            stream.extend(block)
        return np.frombuffer(bytes(stream[:n]), dtype=np.uint8).reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        h, w = self.out_size
        decoded = np.stack([self._decode(p) for p in payloads]) if payloads else np.zeros((0, h, w, 3), np.uint8)
        mean_rgb = decoded.reshape(len(payloads), -1, 3).mean(axis=1) if payloads else np.zeros((0, 3))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array([h] * len(payloads), pa.int32()),
                "width": pa.array([w] * len(payloads), pa.int32()),
                "pixels": pa.array([d.tobytes() for d in decoded], pa.binary()),
                "mean_r": pa.array(np.round(mean_rgb[:, 0]).astype(np.int64), pa.int64()),
                "mean_g": pa.array(np.round(mean_rgb[:, 1]).astype(np.int64), pa.int64()),
                "mean_b": pa.array(np.round(mean_rgb[:, 2]).astype(np.int64), pa.int64()),
            }
        )


class AudioFrameStage:
    """Frame-sample an audio binary column -> fixed-rate feature rows.

    Fake decode: interprets payload bytes as int8 PCM. Real decode
    (fake=False) raises NotImplementedError (no soundfile/ffmpeg here).
    """

    def __init__(self, frame_len=256, fake=True):
        self.frame_len = frame_len
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real audio decode requires soundfile/ffmpeg — absent here"
            )
        ids, frame_idx, energy = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            pcm = np.frombuffer(payload, dtype=np.int8).astype(np.int64)
            n_frames = max(1, len(pcm) // self.frame_len)
            for f in range(n_frames):
                seg = pcm[f * self.frame_len : (f + 1) * self.frame_len]
                ids.append(mid)
                frame_idx.append(f)
                energy.append(int((seg * seg).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids),
                "frame": pa.array(frame_idx, pa.int64()),
                "energy": pa.array(energy, pa.int64()),
            }
        )


def make_media_table(n=64, payload_bytes=1024, seed=42):
    """Deterministic opaque-media fixture: (media_id, kind, payload)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(list(range(n)), pa.int64()),
            "kind": pa.array(["image" if i % 2 == 0 else "audio" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
