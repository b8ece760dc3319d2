"""Native C++ host kernels vs numpy semantics."""

import numpy as np
import pytest

from dcpt_tpu.native import f32_normalize, f32_to_u8_bgr, native_available, u8_to_f32


class TestNativeKernels:
    def test_compiles(self):
        assert native_available(), "g++ toolchain expected in this image"

    def test_u8_to_f32_swap(self, rng):
        img = (rng.random((17, 23, 3)) * 255).astype(np.uint8)
        out = u8_to_f32(img, swap_rb=True)
        np.testing.assert_allclose(out, img[:, :, ::-1].astype(np.float32) / 255.0, atol=1e-7)

    def test_u8_to_f32_noswap_gray(self, rng):
        img = (rng.random((9, 11, 1)) * 255).astype(np.uint8)
        out = u8_to_f32(img, swap_rb=False)
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)

    def test_normalize(self, rng):
        img = rng.random((8, 8, 3)).astype(np.float32)
        mean, std = [0.5, 0.4, 0.3], [0.2, 0.25, 0.3]
        out = f32_normalize(img, mean, std)
        np.testing.assert_allclose(out, (img - np.float32(mean)) / np.float32(std), atol=1e-6)

    def test_f32_to_u8_bgr(self, rng):
        img = rng.random((8, 8, 3)).astype(np.float32) * 1.2 - 0.1  # out-of-range on purpose
        out = f32_to_u8_bgr(img)
        expected = np.clip(img[:, :, ::-1], 0, 1).astype(np.float64).__mul__(255.0).round().astype(np.uint8)
        np.testing.assert_array_equal(out, expected)
