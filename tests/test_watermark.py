"""DWT-DCT watermark embed/extract roundtrip."""

import numpy as np

from conceptattention_tpu.utils.watermark import (
    WATERMARK_BITS,
    embed_watermark,
    extract_watermark,
)


def test_roundtrip_recovers_bits():
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(256, 256, 3), dtype=np.uint8)
    marked = embed_watermark(image)
    got = extract_watermark(marked)
    assert got == WATERMARK_BITS


def test_watermark_is_invisible():
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, size=(128, 128, 3), dtype=np.uint8)
    marked = embed_watermark(image)
    err = np.abs(marked.astype(np.float64) - image.astype(np.float64))
    psnr = 10 * np.log10(255**2 / max(np.mean(err**2), 1e-9))
    assert psnr > 35, psnr  # visually lossless


def test_custom_bits():
    rng = np.random.default_rng(2)
    image = rng.integers(0, 255, size=(128, 128, 3), dtype=np.uint8)
    bits = [1, 0, 1, 1, 0, 0, 1, 0]
    marked = embed_watermark(image, bits=bits)
    assert extract_watermark(marked, num_bits=8) == bits
