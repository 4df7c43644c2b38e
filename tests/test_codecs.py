"""Codec tests: lossless roundtrips, PSNR gate for the lossy codec, PNG spec
conformance, deterministic raster synthesis (mirrors the reference's mock
raster fixture style, reference tests/conftest.py:146-173)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from stac_catalog_builder_spark.functions.codecs import (
    PNG_SIG,
    decode_dct,
    decode_image,
    decode_png,
    decode_raw,
    encode_dct,
    encode_image,
    encode_png,
    encode_raw,
    make_raster,
    psnr,
    resize_nearest,
)

SHAPES = [(180, 240), (120, 180), (64, 64), (37, 53)]  # incl. non-8-multiples


@pytest.fixture(params=[12345, 987654321, 2**40 + 7])
def raster(request):
    return make_raster(request.param, 96, 64)


def test_make_raster_deterministic():
    a = make_raster(42, 240, 180)
    b = make_raster(42, 240, 180)
    assert np.array_equal(a, b)
    assert a.shape == (180, 240)
    assert a.dtype == np.uint8
    assert not np.array_equal(a, make_raster(43, 240, 180))


@pytest.mark.parametrize(["h", "w"], SHAPES)
def test_raw_roundtrip(h, w):
    arr = make_raster(7, w, h)
    assert np.array_equal(decode_raw(encode_raw(arr)), arr)


@pytest.mark.parametrize(["h", "w"], SHAPES)
def test_png_roundtrip_lossless(h, w):
    arr = make_raster(11, w, h)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_png_is_spec_conformant(raster):
    data = encode_png(raster)
    assert data[:8] == PNG_SIG
    # first chunk must be IHDR with correct dims and valid CRC
    (length,) = struct.unpack(">I", data[8:12])
    assert data[12:16] == b"IHDR"
    payload = data[16 : 16 + length]
    w, h = struct.unpack(">II", payload[:8])
    assert (h, w) == raster.shape
    (crc,) = struct.unpack(">I", data[16 + length : 20 + length])
    assert crc == zlib.crc32(b"IHDR" + payload) & 0xFFFFFFFF


@pytest.mark.parametrize(["h", "w"], SHAPES)
def test_dct_lossy_meets_psnr_gate(h, w):
    """BASELINE.json input_hint: PSNR >= 40 dB for lossy formats."""
    arr = make_raster(99, w, h)
    out = decode_dct(encode_dct(arr))
    assert out.shape == arr.shape
    assert psnr(arr, out) >= 40.0


def test_codec_registry_dispatch(raster):
    for fmt in ("raw", "png", "dct"):
        data = encode_image(raster, fmt)
        out = decode_image(data, fmt)
        assert out.shape == raster.shape


def test_decoders_reject_wrong_magic():
    with pytest.raises(ValueError):
        decode_raw(b"PNG9" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_png(b"RAW1" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_dct(b"nope" + b"\x00" * 16)


def test_resize_nearest():
    arr = make_raster(5, 100, 80)
    out = resize_nearest(arr, 64, 64)
    assert out.shape == (64, 64)
    # identity resize is exact
    assert np.array_equal(resize_nearest(arr, 80, 100), arr)


def test_psnr_identity_is_inf():
    arr = make_raster(1, 32, 32)
    assert psnr(arr, arr) == float("inf")
    assert psnr(arr, 255 - arr) < 10.0
