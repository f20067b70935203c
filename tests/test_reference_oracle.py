"""Direct numeric parity vs the REFERENCE's own metrics implementation.

Loads /root/reference's evaluation/metrics.py verbatim (torch + sklearn are
installed) and compares our implementations against it on random inputs —
the strongest parity evidence available without its full dependency stack.
"""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')
pytest.importorskip('sklearn')

from awsegbench.metrics.calibration import ConfidenceCalibration
from awsegbench.metrics.disagreement import EnsembleDisagreementMetrics
from awsegbench.metrics.iou import IoUMetrics
from awsegbench.metrics.robustness import RobustnessMetrics


@pytest.fixture(scope='module')
def ref_metrics():
    spec = importlib.util.spec_from_file_location(
        'ref_metrics',
        '/root/reference/src/adverse_weather_semantic_segmentation_'
        'robustness_benchmark/evaluation/metrics.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def data():
    rng = np.random.default_rng(7)
    b, c, h, w = 2, 7, 20, 28
    logits = (rng.normal(size=(b, c, h, w)) * 3).astype(np.float32)
    logits2 = (rng.normal(size=(b, c, h, w)) * 3).astype(np.float32)
    targets = rng.integers(0, c, (b, h, w))
    targets[0, :3, :3] = 255
    return logits, logits2, targets


class TestAgainstReferenceMetrics:
    def test_iou(self, ref_metrics, data):
        logits, _, targets = data
        ref = ref_metrics.IoUMetrics(7).compute_iou(
            torch.from_numpy(logits), torch.from_numpy(targets))
        ours = IoUMetrics(7).compute_iou(logits, targets)
        assert abs(ref['mean_iou'] - ours['mean_iou']) < 1e-6
        assert np.allclose(ref['per_class_iou'], ours['per_class_iou'],
                           atol=1e-6)

    def test_pixel_accuracy(self, ref_metrics, data):
        logits, _, targets = data
        ref = ref_metrics.IoUMetrics(7).compute_pixel_accuracy(
            torch.from_numpy(logits), torch.from_numpy(targets))
        ours = IoUMetrics(7).compute_pixel_accuracy(logits, targets)
        assert abs(ref - ours) < 1e-6

    def test_ece(self, ref_metrics, data):
        logits, _, targets = data
        ref = ref_metrics.ConfidenceCalibration().compute_ece(
            torch.from_numpy(logits), torch.from_numpy(targets))
        ours = ConfidenceCalibration().compute_ece(logits, targets)
        assert abs(ref - ours) < 1e-5

    def test_ece_details(self, ref_metrics, data):
        logits, _, targets = data
        ref = ref_metrics.ConfidenceCalibration().compute_ece(
            torch.from_numpy(logits), torch.from_numpy(targets),
            return_details=True)
        ours = ConfidenceCalibration().compute_ece(logits, targets,
                                                   return_details=True)
        assert abs(ref['ece'] - ours['ece']) < 1e-5
        assert abs(ref['overall_accuracy'] - ours['overall_accuracy']) < 1e-5
        for rb, ob in zip(ref['bin_details'], ours['bin_details']):
            assert abs(rb['proportion'] - ob['proportion']) < 1e-5
            assert abs(rb['accuracy'] - ob['accuracy']) < 1e-5

    def test_disagreement_map(self, ref_metrics, data):
        logits, logits2, _ = data
        ref = ref_metrics.EnsembleDisagreementMetrics().compute_disagreement_map(
            [torch.from_numpy(logits), torch.from_numpy(logits2)]).numpy()
        ours = np.asarray(EnsembleDisagreementMetrics().compute_disagreement_map(
            [logits, logits2]))
        assert np.abs(ref - ours).max() < 1e-5

    def test_variance_map(self, ref_metrics, data):
        logits, logits2, _ = data
        ref = ref_metrics.EnsembleDisagreementMetrics().compute_variance_map(
            [torch.from_numpy(logits), torch.from_numpy(logits2)]).numpy()
        ours = np.asarray(EnsembleDisagreementMetrics().compute_variance_map(
            [logits, logits2]))
        assert np.abs(ref - ours).max() < 1e-6

    def test_js_divergence(self, ref_metrics, data):
        logits, logits2, _ = data
        ref = ref_metrics.EnsembleDisagreementMetrics(
        ).compute_jensen_shannon_divergence(
            torch.from_numpy(logits), torch.from_numpy(logits2)).numpy()
        ours = np.asarray(EnsembleDisagreementMetrics(
        ).compute_jensen_shannon_divergence(logits, logits2))
        assert np.abs(ref - ours).max() < 1e-5

    def test_disagreement_auroc(self, ref_metrics, data):
        logits, logits2, targets = data
        ref = ref_metrics.EnsembleDisagreementMetrics(
        ).compute_disagreement_auroc(
            [torch.from_numpy(logits), torch.from_numpy(logits2)],
            torch.from_numpy(targets))
        ours = EnsembleDisagreementMetrics().compute_disagreement_auroc(
            [logits, logits2], targets)
        assert abs(ref - ours) < 1e-5

    def test_degradation_ratio(self, ref_metrics):
        ref_rm = ref_metrics.RobustnessMetrics(7)
        our_rm = RobustnessMetrics(7)
        for clean, adverse in [(0.8, 0.6), (0.5, 0.7), (0.0, 0.3),
                               (0.9, 0.0)]:
            assert (ref_rm.compute_robustness_degradation_ratio(clean, adverse)
                    == our_rm.compute_robustness_degradation_ratio(clean, adverse))

    def test_robustness_summary(self, ref_metrics):
        wm = {
            'clean': {'mean_iou': 0.8, 'expected_calibration_error': 0.02,
                      'ensemble_disagreement_auroc': 0.9},
            'fog': {'mean_iou': 0.6, 'expected_calibration_error': 0.05,
                    'ensemble_disagreement_auroc': 0.8},
            'rain': {'mean_iou': 0.65, 'expected_calibration_error': 0.04,
                     'ensemble_disagreement_auroc': 0.85},
        }
        ref = ref_metrics.RobustnessMetrics(7).create_robustness_summary(wm)
        ours = RobustnessMetrics(7).create_robustness_summary(wm)
        for k in ref:
            assert abs(ref[k] - ours[k]) < 1e-9, k

    def test_optimize_temperature_note(self, ref_metrics, data):
        """The reference's temperature grid search flattens NCHW with a raw
        view(-1, C) — a latent bug we deliberately fixed (PARITY.md). This
        test documents the deviation: both return values in [0.1, 10]."""
        logits, _, targets = data
        ref = ref_metrics.ConfidenceCalibration().optimize_temperature(
            torch.from_numpy(logits), torch.from_numpy(targets))
        ours = ConfidenceCalibration().optimize_temperature(logits, targets)
        assert 0.1 <= ref <= 10.0 and 0.1 <= ours <= 10.0

    def test_optimize_temperature_oracle_2d(self, ref_metrics):
        """Direct oracle where the reference bug is benign: on 2-D [N, C]
        logits ``view(-1, C)`` is the identity, so the reference grid search
        (metrics.py:283-321) is correct there and must match ours exactly."""
        rng = np.random.default_rng(11)
        n, c = 4096, 7
        targets = rng.integers(0, c, (n,))
        onehot = np.eye(c, dtype=np.float32)[targets]
        # overconfident logits → interior optimal temperature (> 1)
        logits = (6.0 * onehot
                  + rng.normal(size=(n, c)).astype(np.float32) * 1.5)
        targets[:64] = 255  # exercise the ignore-mask path too
        ref = ref_metrics.ConfidenceCalibration().optimize_temperature(
            torch.from_numpy(logits), torch.from_numpy(targets))
        ours = ConfidenceCalibration().optimize_temperature(logits, targets)
        assert 0.1 < ours < 10.0, "optimum should be interior"
        assert abs(ref - ours) < 1e-6, (ref, ours)

    def test_optimize_temperature_nll_argmin_4d(self):
        """First-principles oracle for the documented deviation on NCHW
        input: our result must be the argmin of the true per-distribution
        NLL over the same 100-point grid, computed independently in numpy."""
        rng = np.random.default_rng(12)
        b, c, h, w = 2, 7, 12, 16
        targets = rng.integers(0, c, (b, h, w))
        onehot = np.moveaxis(np.eye(c, dtype=np.float32)[targets], -1, 1)
        logits = (5.0 * onehot
                  + rng.normal(size=(b, c, h, w)).astype(np.float32))
        targets[0, :2, :2] = 255

        lf = np.moveaxis(logits, 1, -1).reshape(-1, c).astype(np.float64)
        tf = targets.reshape(-1)
        valid = tf != 255
        lf, tf = lf[valid], tf[valid]
        temps = np.linspace(0.1, 10.0, 100)
        nlls = []
        for t in temps:
            z = lf / t
            logp = z - np.log(np.exp(z - z.max(-1, keepdims=True)).sum(-1,
                              keepdims=True)) - z.max(-1, keepdims=True)
            nlls.append(-logp[np.arange(len(tf)), tf].mean())
        expected = temps[int(np.argmin(nlls))]

        ours = ConfidenceCalibration().optimize_temperature(logits, targets)
        assert abs(ours - expected) < 1e-6, (ours, expected)
