"""Tests for the trained-quality-fixture tooling (tools/make_shapes_dataset
+ tools/fixture_quality_audit): dataset determinism and classifier
correctness on clean renders. The audit's adherence numbers are only
meaningful if the geometric classifiers are exact on the ground-truth
distribution they were designed for."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from fixture_quality_audit import adherence, classify  # noqa: E402
from make_shapes_dataset import (  # noqa: E402
    BACKGROUND,
    COLORS,
    SHAPES,
    caption_for,
    draw_sample,
)


def _to_unit(img) -> np.ndarray:
    return np.asarray(img, np.float32) / 127.5 - 1.0


class TestClassifier:
    def test_all_classes_classified_exactly(self):
        rng = np.random.RandomState(0)
        for color in COLORS:
            for shape in SHAPES:
                for _ in range(3):  # random size/position jitter
                    img = _to_unit(draw_sample(64, color, shape, rng))
                    c, s = classify(img)
                    assert (c, s) == (color, shape), (
                        color, shape, c, s)

    def test_background_is_blank(self):
        img = np.full((64, 64, 3), 0.0, np.float32)
        img[:] = (np.asarray(BACKGROUND, np.float32) / 127.5) - 1.0
        assert classify(img) == (None, None)

    def test_noise_robustness(self):
        # bf16-sampling-level noise must not flip any class
        rng = np.random.RandomState(1)
        for color in ("red", "white", "cyan"):
            for shape in SHAPES:
                img = _to_unit(draw_sample(64, color, shape, rng))
                noisy = img + rng.randn(*img.shape).astype(np.float32) * 0.03
                assert classify(noisy) == (color, shape)

    def test_adherence_aggregation(self):
        rng = np.random.RandomState(2)
        imgs, truth = [], []
        for color in ("red", "blue"):
            for shape in SHAPES:
                imgs.append(_to_unit(draw_sample(64, color, shape, rng)))
                truth.append((color, shape))
        # one deliberate mismatch: last prompt claims green
        truth[-1] = ("green", truth[-1][1])
        row = adherence(np.stack(imgs), truth)
        assert row["n"] == 6
        assert row["shape_acc"] == 1.0
        assert row["color_acc"] == pytest.approx(5 / 6, abs=1e-3)
        assert row["both_acc"] == pytest.approx(5 / 6, abs=1e-3)
        assert row["blank_frac"] == 0.0


class TestDatasetDeterminism:
    def test_same_seed_same_pixels(self):
        a = draw_sample(64, "purple", "triangle", np.random.RandomState(7))
        b = draw_sample(64, "purple", "triangle", np.random.RandomState(7))
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_caption_vocabulary(self):
        caps = {caption_for(c, s) for c in COLORS for s in SHAPES}
        assert len(caps) == len(COLORS) * len(SHAPES)
        assert all(cap.startswith("a ") for cap in caps)
