"""Image codecs + raster synthesis (no PIL/rasterio in this environment).

Formats we fully control (SURVEY.md §7.0):
- ``raw``: RAW1 header + uint16 dims + uint8 pixels (lossless)
- ``png``: real minimal PNG — 8-bit grayscale, filter 0, zlib — encoder and
  decoder implement the actual spec (signature/IHDR/IDAT/IEND + CRC32), so
  bytes are readable by any standard viewer (lossless)
- ``dct``: 8x8 block DCT with uniform quantization (lossy; quality chosen so
  PSNR >= 40 dB, the BASELINE.json input_hint gate)

``make_raster`` mirrors the reference's mock-GeoTIFF generator — a smooth
2-Gaussian gradient field plus deterministic per-image noise
(reference tests/conftest.py:146-173) — seeded by ``phash`` so any executor
can regenerate the ground-truth pixels for invariant checks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

RAW_MAGIC = b"RAW1"
PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# Raster synthesis (deterministic from phash)
# ---------------------------------------------------------------------------

def make_raster(phash: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w) uint8 raster: 2-Gaussian gradient + seeded noise."""
    yy, xx = np.mgrid[0:h, 0:w]
    cx1, cy1 = (phash % 997) / 997.0 * w, ((phash >> 10) % 991) / 991.0 * h
    cx2, cy2 = ((phash >> 20) % 983) / 983.0 * w, ((phash >> 30) % 977) / 977.0 * h
    s = max(w, h) / 3.0
    g = np.exp(-(((xx - cx1) ** 2 + (yy - cy1) ** 2) / (2 * s * s))) + 0.7 * np.exp(
        -(((xx - cx2) ** 2 + (yy - cy2) ** 2) / (2 * s * s))
    )
    rng = np.random.default_rng(phash & 0xFFFFFFFF)
    noise = rng.integers(0, 16, size=(h, w))
    return np.clip(g / g.max() * 223.0 + noise, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# raw codec
# ---------------------------------------------------------------------------

def encode_raw(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return RAW_MAGIC + struct.pack("<HH", w, h) + arr.astype(np.uint8).tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != RAW_MAGIC:
        raise ValueError("not a RAW1 payload")
    w, h = struct.unpack("<HH", data[4:8])
    return np.frombuffer(data[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)


# ---------------------------------------------------------------------------
# png codec (8-bit grayscale, filter 0)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    scanlines = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w, h, idat = len(PNG_SIG), 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    if (rows[:, 0] != 0).any():
        raise ValueError("only filter 0 supported")
    return rows[:, 1:].copy()


# ---------------------------------------------------------------------------
# dct codec (lossy)
# ---------------------------------------------------------------------------

_DCT_N = 8
_Q = 6.0  # uniform quantization step — keeps PSNR comfortably >= 40 dB


def _dct_matrix() -> np.ndarray:
    n = _DCT_N
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_DCT_M = _dct_matrix()


def encode_dct(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    ph, pw = (-h) % _DCT_N, (-w) % _DCT_N
    a = np.pad(arr.astype(np.float64) - 128.0, ((0, ph), (0, pw)), mode="edge")
    hh, ww = a.shape
    blocks = a.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    coef = _DCT_M @ blocks @ _DCT_M.T
    q = np.rint(coef / _Q).astype(np.int16)
    payload = zlib.compress(q.tobytes(), 6)
    return b"DCT1" + struct.pack("<HHHH", w, h, ww, hh) + payload


def decode_dct(data: bytes) -> np.ndarray:
    if data[:4] != b"DCT1":
        raise ValueError("not a DCT1 payload")
    w, h, ww, hh = struct.unpack("<HHHH", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16).reshape(
        hh // 8, ww // 8, 8, 8
    )
    coef = q.astype(np.float64) * _Q
    blocks = _DCT_M.T @ coef @ _DCT_M
    a = blocks.transpose(0, 2, 1, 3).reshape(hh, ww) + 128.0
    return np.clip(a[:h, :w], 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

CODECS = {
    "raw": (encode_raw, decode_raw),
    "png": (encode_png, decode_png),
    "dct": (encode_dct, decode_dct),
}


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    return CODECS[fmt][0](arr)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return CODECS[fmt][1](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index mapping)."""
    h, w = arr.shape
    yi = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return arr[yi[:, None], xi[None, :]]
