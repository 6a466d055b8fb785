"""Native host-side image-ops: build, parity with numpy, fallback."""

import numpy as np
import pytest

from f_lite_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")


class TestNormalize:
    def test_matches_numpy(self):
        rs = np.random.RandomState(0)
        img = rs.randint(0, 256, (64, 48, 3), np.uint8)
        ref = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(
            native.normalize_u8(img), ref, atol=1e-6
        )

    def test_batch_with_flip(self):
        rs = np.random.RandomState(1)
        imgs = rs.randint(0, 256, (4, 32, 40, 3), np.uint8)
        flip = np.array([1, 0, 1, 0], np.uint8)
        got = native.normalize_batch_u8(imgs, flip)
        ref = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(got[0], ref[0, :, ::-1], atol=1e-6)
        np.testing.assert_allclose(got[1], ref[1], atol=1e-6)
        np.testing.assert_allclose(got[2], ref[2, :, ::-1], atol=1e-6)

    def test_denormalize_roundtrip(self):
        rs = np.random.RandomState(2)
        x = (rs.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1)
        got = native.denormalize_to_u8(x)
        ref = np.clip(
            np.round((x * 0.5 + 0.5) * 255.0), 0, 255
        ).astype(np.uint8)
        # allow off-by-one at exact .5 boundaries (float assoc.)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
        assert (got != ref).mean() < 0.01

    def test_u8_roundtrip_exact(self):
        # u8 -> normalize -> denormalize must be the identity
        rs = np.random.RandomState(3)
        img = rs.randint(0, 256, (8, 8, 3), np.uint8)
        back = native.denormalize_to_u8(native.normalize_u8(img))
        np.testing.assert_array_equal(back, img)
