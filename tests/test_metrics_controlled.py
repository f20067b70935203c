"""Controlled-input metric sanity tests (known ground-truth values)."""

import numpy as np

from awsegbench.metrics.calibration import ConfidenceCalibration
from awsegbench.metrics.iou import IoUMetrics
from awsegbench.metrics.robustness import RobustnessMetrics


class TestIoUControlled:
    def test_perfect_predictions_give_one(self):
        t = np.random.default_rng(0).integers(0, 5, (2, 16, 16))
        m = IoUMetrics(5).compute_iou(t.copy(), t)
        assert abs(m['mean_iou'] - 1.0) < 1e-6
        assert IoUMetrics(5).compute_pixel_accuracy(t.copy(), t) == 1.0

    def test_disjoint_predictions_give_zero(self):
        t = np.zeros((1, 8, 8), np.int32)
        p = np.ones((1, 8, 8), np.int32)
        m = IoUMetrics(5).compute_iou(p, t)
        assert m['mean_iou'] == 0.0

    def test_known_half_overlap(self):
        # class 0 everywhere; predictions right half class 1
        t = np.zeros((1, 4, 8), np.int32)
        p = np.zeros((1, 4, 8), np.int32)
        p[:, :, 4:] = 1
        m = IoUMetrics(2).compute_iou(p, t)
        # class0: inter 16, union 32 → 0.5; class1: inter 0, union 16 → 0
        assert abs(m['per_class_iou'][0] - 0.5) < 1e-6
        assert m['per_class_iou'][1] == 0.0
        assert abs(m['mean_iou'] - 0.25) < 1e-6

    def test_ignore_index_excluded(self):
        t = np.zeros((1, 4, 4), np.int32)
        t[0, 0, :] = 255
        p = np.zeros((1, 4, 4), np.int32)
        p[0, 0, :] = 1  # wrong, but ignored
        m = IoUMetrics(2).compute_iou(p, t)
        assert abs(m['mean_iou'] - 1.0) < 1e-6


class TestECEControlled:
    def test_perfectly_calibrated_sharp_predictions(self):
        """Logits so sharp that confidence≈1 and always correct → ECE≈0."""
        t = np.random.default_rng(1).integers(0, 3, (1, 8, 8))
        logits = np.full((1, 3, 8, 8), -50.0, np.float32)
        for c in range(3):
            logits[0, c][t[0] == c] = 50.0
        ece = ConfidenceCalibration().compute_ece(logits, t)
        assert ece < 1e-5

    def test_confident_but_wrong(self):
        """Always confident (≈1) and always wrong → ECE ≈ 1."""
        t = np.zeros((1, 8, 8), np.int64)
        logits = np.zeros((1, 3, 8, 8), np.float32)
        logits[0, 1] = 50.0  # predicts class 1, truth class 0
        ece = ConfidenceCalibration().compute_ece(logits, t)
        assert ece > 0.99


class TestRobustnessControlled:
    def test_weather_specific_metrics(self):
        rng = np.random.default_rng(2)
        t_clean = rng.integers(0, 5, (2, 8, 8))
        t_fog = rng.integers(0, 5, (2, 8, 8))
        rm = RobustnessMetrics(5, ['clean', 'fog'])
        m = rm.compute_weather_specific_metrics(
            {'clean': t_clean.copy(), 'fog': t_fog.copy()},
            {'clean': t_clean, 'fog': t_fog})
        assert abs(m['miou_clean'] - 1.0) < 1e-6
        assert abs(m['miou_fog'] - 1.0) < 1e-6
