"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with typed metadata
columns alongside, decoded in actor-pool ``map_batches`` stages with small
batches (binary rows are wide).

REAL decode kernels, pure numpy (no imaging libraries needed):
  * binary PPM ("P6") — header parse incl. comments, raw RGB;
  * uncompressed 24-bit BMP ("BM") — bottom-up rows, 4-byte row padding,
    BGR→RGB, negative-height top-down variant.
JPEG/PNG/audio/video codecs are NOT implemented here (they need
PIL/ffmpeg, absent in this environment) — `_decode` raises a clear error
for unknown magics; wire PIL.Image.open / PyAV at that dispatch point in a
full deployment.

A deterministic fake payload format ("SYN1") additionally lets tests
exercise the full path without any encoder: 16-byte header = magic, width,
height, channels (little-endian uint32s) followed by synthetic pixel bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"SYN1"


# ------------------------------------------------------------ real decoders


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Full header grammar: tokens
    separated by whitespace, ``#`` comments to end-of-line, maxval ≤ 255."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, toks = 2, []
    n = len(payload)
    while len(toks) < 3:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < n and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos:pos + 1].isspace():
            pos += 1
        toks.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB.  Handles the 4-byte
    row padding, bottom-up row order, and the negative-height (top-down)
    variant."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_offset).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_bytes = rows.tobytes()
    data_offset = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", data_offset + len(pixel_bytes), 0, 0, data_offset)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes),
                            2835, 2835, 0, 0))
    return header + pixel_bytes


def synth_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic media table mixing REAL formats (PPM, BMP) with the
    synthetic SYN1 payloads — the same pixel content per row regardless of
    encoding, so decode output is format-independent."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        c = 3
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        fmt = ("syn1", "ppm", "bmp")[i % 3]
        if fmt == "ppm":
            payloads.append(encode_ppm(img))
        elif fmt == "bmp":
            payloads.append(encode_bmp(img))
        else:
            payloads.append(MAGIC + struct.pack("<III", w, h, c) + img.tobytes())
        ids.append(i)
        kinds.append(fmt)
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


def decode_payload(payload: bytes) -> np.ndarray:
    """Magic-dispatched decode: PPM / BMP (real, numpy) / SYN1 (synthetic
    test format).  Extend this dispatch with PIL/PyAV for JPEG/PNG/video
    in environments that have them."""
    head = payload[:4]
    if head[:2] == b"P6":
        return decode_ppm(payload)
    if head[:2] == b"BM":
        return decode_bmp(payload)
    if head == MAGIC:
        w, h, c = struct.unpack("<III", payload[4:16])
        return np.frombuffer(payload[16: 16 + w * h * c], dtype=np.uint8).reshape(h, w, c)
    raise ValueError(f"unsupported media magic {head!r} (JPEG/PNG need PIL)")


class MediaDecode:
    """Actor-pool decode stage: magic-dispatched :func:`decode_payload`
    per row (actor init once, small batch_size for wide binary rows,
    arrow-native output)."""

    def __init__(self) -> None:
        pass

    # kept for back-compat with older call sites/tests
    @staticmethod
    def _decode_fake(payload: bytes) -> np.ndarray:
        return decode_payload(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, shapes = [], []
        for payload in batch["payload"].to_pylist():
            img = decode_payload(payload)
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
            img = decode_payload(payload)
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
    # max_restarts=0: Ray Data ships the wrapped UDF through the object
    # store, and an actor restart after object loss would fail anyway (Ray
    # issue 53727 warns about exactly this); a dead decode actor's work is
    # re-dispatched to the surviving pool members via lineage instead
    decoded = ds.map_batches(MediaDecode, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=(1, pool),
                             num_cpus=1, max_restarts=0)
    feats = ds.map_batches(MediaResize, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=(1, pool),
                           num_cpus=1, max_restarts=0)
    return decoded, feats
