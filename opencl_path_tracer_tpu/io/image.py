"""PNG image I/O.

The reference cannot save images at all (download_image is commented out,
main.cpp:727-741; output goes only to a GL texture). Headless PNG output
is the TPU-native replacement for the GL interop display path
(main.cpp:670-676). Uses PIL when present; otherwise a dependency-free
zlib PNG encoder/decoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:
    from PIL import Image as _PIL
except Exception:  # pragma: no cover
    _PIL = None


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp float [0,1] (H,W,3|4) to uint8. NaNs (the reference's
    black-pixel tonemap quirk, see ops/tonemap.py) clamp to 0."""
    img = np.asarray(img, np.float32)
    img = np.nan_to_num(img, nan=0.0, posinf=1.0, neginf=0.0)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """img: (H, W, 3) float in [0,1] or uint8."""
    if img.dtype != np.uint8:
        img = to_uint8(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if _PIL is not None:
        _PIL.fromarray(img, "RGB").save(path)
        return
    _write_png_raw(path, img)


def _write_png_raw(path: str, img: np.ndarray) -> None:
    h, w, _ = img.shape
    raw = b"".join(
        b"\x00" + img[y].tobytes() for y in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        fh.write(chunk(b"IEND", b""))


def write_pfm(path: str, img: np.ndarray) -> None:
    """Portable FloatMap (PF): linear f32 HDR, the standard exchange
    format for untonemapped radiance. img: (H, W, 3) float, row 0 =
    TOP (raster order, like RenderEngine.image()); PFM stores rows
    bottom-up with a negative scale for little-endian."""
    img = np.asarray(img, np.float32)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"PFM needs (H, W, 3), got {img.shape}")
    h, w, _ = img.shape
    with open(path, "wb") as fh:
        fh.write(b"PF\n" + f"{w} {h}\n".encode() + b"-1.0\n")
        fh.write(img[::-1].astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    """Returns (H, W, 3) float32, row 0 = top. The header scale's sign
    is endianness; its magnitude is a radiance multiplier (PFM spec) —
    externally-written files may carry |scale| != 1."""
    with open(path, "rb") as fh:
        if fh.readline().strip() != b"PF":
            raise ValueError("not a color PFM")
        w, h = (int(v) for v in fh.readline().split())
        scale = float(fh.readline())
        data = np.frombuffer(fh.read(w * h * 12),
                             "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, 3)[::-1].astype(np.float32)
    if abs(scale) != 1.0:
        img = img * np.float32(abs(scale))
    return img


def read_png(path: str) -> np.ndarray:
    """Returns (H, W, 3) uint8."""
    if _PIL is not None:
        return np.asarray(_PIL.open(path).convert("RGB"))
    return _read_png_raw(path)


def _read_png_raw(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, w, 3), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], np.uint8
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # up
            row = (row.astype(np.int32) + prev) % 256
        elif ftype == 1:  # sub
            row = row.astype(np.int32)
            for x in range(3, stride):
                row[x] = (row[x] + row[x - 3]) % 256
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        row = row.astype(np.uint8)
        out[y] = row.reshape(w, 3)
        prev = row
    return out
