"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with typed metadata
columns alongside.  The decode kernels themselves are STUBBED (no
image/audio libraries in this environment — clearly marked below), but the
Ray-side plumbing is real and tested: schema, actor-pool stage signatures,
small-batch sizing for wide binary rows, and the output layout.

A deterministic fake payload format ("SYN1") lets tests exercise the full
path: 16-byte header = magic, width, height, channels (little-endian
uint32s) followed by synthetic pixel bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"SYN1"


def synth_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media table: (media_id, kind, payload, meta...)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        c = 3
        body = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
        payloads.append(MAGIC + struct.pack("<III", w, h, c) + body)
        ids.append(i)
        kinds.append("image")
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


class MediaDecode:
    """Actor-pool decode stage.

    Real deployments replace ``_decode_real`` with PIL/torchvision/ffmpeg
    calls; the Ray plumbing (actor init once, small batch_size for wide
    binary rows, arrow-native output) is identical.
    """

    def __init__(self, use_stub: bool = True) -> None:
        self.use_stub = use_stub

    @staticmethod
    def _decode_real(payload: bytes):
        # STUB: image/audio decode libraries are not available in this
        # container.  Wire PIL.Image.open / torchaudio.load / PyAV here.
        raise NotImplementedError("real media decode requires PIL/ffmpeg")

    @staticmethod
    def _decode_fake(payload: bytes) -> np.ndarray:
        if payload[:4] != MAGIC:
            raise ValueError("bad magic")
        w, h, c = struct.unpack("<III", payload[4:16])
        return np.frombuffer(payload[16 : 16 + w * h * c], dtype=np.uint8).reshape(h, w, c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, shapes = [], []
        for payload in batch["payload"].to_pylist():
            img = self._decode_fake(payload) if self.use_stub else self._decode_real(payload)
            means.append(float(img.mean()))
            shapes.append(list(img.shape))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "decoded_shape": pa.array(shapes, pa.list_(pa.int32())),
                "mean_intensity": pa.array(means, pa.float64()),
            }
        )


class MediaResize:
    """Actor-pool resize/feature stage (nearest-neighbor on the fake pixels
    — a real deployment swaps in a vectorized resize kernel)."""

    def __init__(self, target: int = 16) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            img = MediaDecode._decode_fake(payload)
            h, w, _ = img.shape
            ys = (np.arange(self.target) * h // self.target)
            xs = (np.arange(self.target) * w // self.target)
            small = img[np.ix_(ys, xs)].astype(np.float32) / 255.0
            feats.append(small.mean(axis=2).ravel())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


def media_pipeline(ds, concurrency: int | None = None, batch_size: int = 64):
    """decode → feature stages as actor pools; small batches because binary
    rows are wide (object-store-friendly)."""
    from .common import auto_pool

    pool = auto_pool(concurrency, 1.0)
    decoded = ds.map_batches(MediaDecode, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=(1, pool),
                             num_cpus=1)
    feats = ds.map_batches(MediaResize, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=(1, pool),
                           num_cpus=1)
    return decoded, feats
