"""Metrics tests — numeric parity with the reference torch formulas.

The reference formulas (metrics.py) are re-derived here in numpy/torch as
independent oracles; our streaming on-device accumulators must match them
exactly (mIoU/ECE) or to float tolerance (MI/JS/AUROC). sklearn is used as
the AUROC oracle exactly as the reference does (metrics.py:435).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from awsegbench.metrics.calibration import (ConfidenceCalibration,
                                            ece_bin_update, ece_from_bins)
from awsegbench.metrics.disagreement import (EnsembleDisagreementMetrics,
                                             auroc_exact,
                                             auroc_from_histogram,
                                             auroc_histogram_update,
                                             disagreement_map,
                                             jensen_shannon_divergence)
from awsegbench.metrics.iou import (IoUMetrics, argmax_onehot,
                                    confusion_matrix,
                                    confusion_matrix_from_logits,
                                    confusion_matrix_per_weather,
                                    confusion_matrix_per_weather_from_logits,
                                    iou_from_confusion)
from awsegbench.metrics.robustness import RobustnessMetrics

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402


class TestIoU:
    def test_miou_matches_torch_oracle(self, random_logits_targets):
        logits, targets = random_logits_targets
        preds = logits.argmax(1)

        # torch oracle replicating metrics.py:62-89
        pt = torch.from_numpy(preds).view(-1)
        tt = torch.from_numpy(targets).view(-1)
        keep = tt != 255
        pt, tt = pt[keep], tt[keep]
        cm = torch.zeros(25, dtype=torch.long)
        cm.index_add_(0, (tt * 5 + pt).long(), torch.ones_like(tt))
        cm = cm.view(5, 5)
        inter = torch.diag(cm)
        union = cm.sum(0) + cm.sum(1) - inter
        valid = union > 0
        pci = torch.zeros(5)
        pci[valid] = inter[valid].float() / union[valid].float()
        oracle = float(pci[valid].mean())

        ours = IoUMetrics(5).compute_iou(preds, targets)
        assert abs(ours['mean_iou'] - oracle) < 1e-6

    def test_logits_input_argmaxed(self, random_logits_targets):
        logits, targets = random_logits_targets
        m = IoUMetrics(5)
        a = m.compute_iou(logits, targets)['mean_iou']
        b = m.compute_iou(logits.argmax(1), targets)['mean_iou']
        assert a == b

    def test_streaming_equals_oneshot(self, random_logits_targets):
        logits, targets = random_logits_targets
        preds = logits.argmax(1)
        full = confusion_matrix(jnp.asarray(preds), jnp.asarray(targets), 5)
        partial = (confusion_matrix(jnp.asarray(preds[:1]),
                                    jnp.asarray(targets[:1]), 5) +
                   confusion_matrix(jnp.asarray(preds[1:]),
                                    jnp.asarray(targets[1:]), 5))
        assert np.array_equal(np.asarray(full), np.asarray(partial))

    def test_sample_mask_excludes_padding(self, random_logits_targets):
        logits, targets = random_logits_targets
        preds = logits.argmax(1)
        mask = jnp.asarray([True, False])
        masked = confusion_matrix(jnp.asarray(preds), jnp.asarray(targets), 5,
                                  sample_mask=mask)
        only_first = confusion_matrix(jnp.asarray(preds[:1]),
                                      jnp.asarray(targets[:1]), 5)
        assert np.array_equal(np.asarray(masked), np.asarray(only_first))

    def test_pixel_accuracy(self, random_logits_targets):
        logits, targets = random_logits_targets
        preds = logits.argmax(1)
        keep = targets != 255
        oracle = (preds[keep] == targets[keep]).mean()
        ours = IoUMetrics(5).compute_pixel_accuracy(preds, targets)
        assert abs(ours - oracle) < 1e-6


class TestArgmaxOnehotFusion:
    """The from-logits CM path (VERDICT r3 item 3b) must be bit-identical
    to argmax + one-hot, including first-max tie-breaks."""

    def _tied_logits(self, seed, b=2, h=8, w=12, c=7):
        # logits drawn from a 3-value set → plenty of within-row ties
        rng = np.random.default_rng(seed)
        logits = rng.integers(0, 3, (b, h, w, c)).astype(np.float32)
        labels = rng.integers(0, c, (b, h, w)).astype(np.int32)
        labels[0, :2, :2] = 255
        return jnp.asarray(logits), jnp.asarray(labels)

    def test_onehot_matches_argmax_under_ties(self):
        logits, _ = self._tied_logits(0)
        oh = np.asarray(argmax_onehot(logits))
        assert np.all(oh.sum(-1) == 1.0)
        np.testing.assert_array_equal(oh.argmax(-1),
                                      np.asarray(jnp.argmax(logits, -1)))

    def test_cm_from_logits_bit_identical(self):
        logits, labels = self._tied_logits(1)
        preds = jnp.argmax(logits, axis=-1)
        want = np.asarray(confusion_matrix(preds, labels, 7))
        got = np.asarray(confusion_matrix_from_logits(logits, labels, 7))
        np.testing.assert_array_equal(got, want)

    def test_cm_from_logits_sample_mask(self):
        logits, labels = self._tied_logits(2)
        mask = jnp.asarray([1, 0])
        preds = jnp.argmax(logits, axis=-1)
        want = np.asarray(confusion_matrix(preds, labels, 7,
                                           sample_mask=mask))
        got = np.asarray(confusion_matrix_from_logits(logits, labels, 7,
                                                      sample_mask=mask))
        np.testing.assert_array_equal(got, want)

    def test_cm_from_bf16_logits_matches_f32_cast(self):
        # bf16→f32 is monotone injective, so feeding the CM model-dtype
        # bf16 logits (no f32 copy) decides identically — incl. ties,
        # which the 3-value logit set makes plentiful at bf16 precision
        logits_f32, labels = self._tied_logits(4)
        lb = logits_f32.astype(jnp.bfloat16)
        want = np.asarray(confusion_matrix_from_logits(
            lb.astype(jnp.float32), labels, 7))
        got = np.asarray(confusion_matrix_from_logits(lb, labels, 7))
        np.testing.assert_array_equal(got, want)

    def test_nan_rows_match_argmax_not_dropped(self):
        # jnp.argmax orders NaN above everything (first NaN wins); the
        # one-hot path must do the same rather than emit an all-zero row
        # that silently vanishes from the counts
        logits, labels = self._tied_logits(5)
        logits = np.array(logits)  # writable copy
        logits[0, 0, 0, 3] = np.nan                    # single NaN
        logits[0, 1, 2, 1] = logits[0, 1, 2, 5] = np.nan  # two NaNs
        logits[1, 3, 4, :] = np.nan                    # all-NaN row
        logits = jnp.asarray(logits)
        oh = np.asarray(argmax_onehot(logits), np.float32)
        assert np.all(oh.sum(-1) == 1.0)               # nothing dropped
        np.testing.assert_array_equal(oh.argmax(-1),
                                      np.asarray(jnp.argmax(logits, -1)))
        preds = jnp.argmax(logits, axis=-1)
        want = np.asarray(confusion_matrix(preds, labels, 7))
        got = np.asarray(confusion_matrix_from_logits(logits, labels, 7))
        np.testing.assert_array_equal(got, want)

    def test_cm_per_weather_from_logits_bit_identical(self):
        logits, labels = self._tied_logits(3, b=4)
        wid = jnp.asarray([0, 2, 1, 2])
        preds = jnp.argmax(logits, axis=-1)
        want = np.asarray(confusion_matrix_per_weather(
            preds, labels, 7, wid, 5))
        got = np.asarray(confusion_matrix_per_weather_from_logits(
            logits, labels, 7, wid, 5))
        np.testing.assert_array_equal(got, want)


class TestECE:
    def _torch_ece(self, logits, targets, num_bins=15):
        lt = torch.from_numpy(logits)
        tt = torch.from_numpy(targets)
        probs = F.softmax(lt, dim=1)
        conf, pred = torch.max(probs, dim=1)
        conf, pred, tt = conf.view(-1), pred.view(-1), tt.view(-1)
        keep = tt != 255
        conf, pred, tt = conf[keep], pred[keep], tt[keep]
        acc = (pred == tt).float()
        bb = torch.linspace(0, 1, num_bins + 1)
        ece = 0.0
        for lo, up in zip(bb[:-1], bb[1:]):
            in_bin = (conf > lo) & (conf <= up)
            prop = in_bin.float().mean()
            if prop > 0:
                ece += float(torch.abs(conf[in_bin].mean() -
                                       acc[in_bin].mean()) * prop)
        return ece

    def test_ece_matches_torch_oracle(self, random_logits_targets):
        logits, targets = random_logits_targets
        oracle = self._torch_ece(logits, targets)
        ours = ConfidenceCalibration().compute_ece(logits, targets)
        assert abs(ours - oracle) < 1e-5

    def test_streaming_bins_equal_oneshot(self, random_logits_targets):
        logits, targets = random_logits_targets
        full = ece_bin_update(jnp.asarray(logits), jnp.asarray(targets))
        split = (ece_bin_update(jnp.asarray(logits[:1]), jnp.asarray(targets[:1])) +
                 ece_bin_update(jnp.asarray(logits[1:]), jnp.asarray(targets[1:])))
        assert np.allclose(np.asarray(full), np.asarray(split), atol=1e-4)
        assert abs(float(ece_from_bins(full)) - float(ece_from_bins(split))) < 1e-6

    def test_details_dict(self, random_logits_targets):
        logits, targets = random_logits_targets
        d = ConfidenceCalibration().compute_ece(logits, targets,
                                                return_details=True)
        assert set(d) == {'ece', 'bin_details', 'overall_accuracy',
                          'overall_confidence'}
        assert len(d['bin_details']) == 15
        assert abs(sum(b['proportion'] for b in d['bin_details']) - 1.0) < 1e-5

    def test_reliability_diagram_data(self, random_logits_targets):
        logits, targets = random_logits_targets
        d = ConfidenceCalibration().compute_reliability_diagram_data(logits, targets)
        assert len(d['bin_centers']) == len(d['bin_accuracies'])
        assert (d['bin_proportions'] > 0).all()

    def test_optimize_temperature_bounds(self, random_logits_targets):
        logits, targets = random_logits_targets
        t = ConfidenceCalibration().optimize_temperature(logits, targets)
        assert 0.1 <= t <= 10.0


class TestDisagreement:
    def test_mi_matches_torch_oracle(self, random_logits_targets):
        logits, targets = random_logits_targets
        l2 = np.random.randn(*logits.shape).astype(np.float32)
        p = torch.stack([F.softmax(torch.from_numpy(logits), 1),
                         F.softmax(torch.from_numpy(l2), 1)], 0)
        mp = p.mean(0)
        me = -torch.sum(mp * torch.log(mp + 1e-8), dim=1)
        ie = -torch.sum(p * torch.log(p + 1e-8), dim=2)
        oracle = (me - ie.mean(0)).numpy()
        ours = np.asarray(disagreement_map([jnp.asarray(logits),
                                            jnp.asarray(l2)]))
        assert np.abs(oracle - ours).max() < 1e-5

    def test_js_reversed_kl_quirk(self, random_logits_targets):
        logits, targets = random_logits_targets
        l2 = np.random.randn(*logits.shape).astype(np.float32)
        p1 = F.softmax(torch.from_numpy(logits), 1)
        p2 = F.softmax(torch.from_numpy(l2), 1)
        m = (p1 + p2) / 2
        kl1 = F.kl_div(p1.log(), m, reduction='none').sum(dim=1)
        kl2 = F.kl_div(p2.log(), m, reduction='none').sum(dim=1)
        oracle = ((kl1 + kl2) / 2).numpy()
        ours = np.asarray(jensen_shannon_divergence(jnp.asarray(logits),
                                                    jnp.asarray(l2)))
        assert np.abs(oracle - ours).max() < 1e-5

    def test_disagreement_nonneg(self, random_logits_targets):
        logits, _ = random_logits_targets
        l2 = logits + np.random.randn(*logits.shape).astype(np.float32) * 0.1
        mi = np.asarray(disagreement_map([jnp.asarray(logits), jnp.asarray(l2)]))
        assert mi.min() > -1e-4  # MI ≥ 0 up to the 1e-8 log-epsilon quirk

    def test_needs_two_members(self):
        with pytest.raises(ValueError):
            disagreement_map([jnp.zeros((1, 5, 4, 4))])


class TestAUROC:
    def test_exact_matches_sklearn(self):
        sklearn_metrics = pytest.importorskip('sklearn.metrics')
        rng = np.random.default_rng(0)
        scores = np.round(rng.random(5000), 2).astype(np.float32)  # ties
        labels = (rng.random(5000) < 0.3).astype(np.float32)
        oracle = sklearn_metrics.roc_auc_score(labels, scores)
        ours = float(auroc_exact(jnp.asarray(scores), jnp.asarray(labels)))
        assert abs(oracle - ours) < 1e-6

    def test_histogram_close_to_exact(self):
        rng = np.random.default_rng(1)
        scores = rng.random(20000).astype(np.float32)
        labels = (scores + rng.normal(0, 0.3, 20000) > 0.5).astype(np.float32)
        exact = float(auroc_exact(jnp.asarray(scores), jnp.asarray(labels)))
        hist = auroc_histogram_update(jnp.asarray(scores), jnp.asarray(labels),
                                      16384, 0.0, 1.0)
        approx = float(auroc_from_histogram(hist))
        assert abs(exact - approx) < 1e-4

    @pytest.mark.slow
    def test_exact_sharded_matches_sklearn_10m_pixels(self):
        """Distributed exact AUROC (mesh-sharded scores, XLA global sort)
        == sklearn on ≥10⁷ pixels with heavy ties (VERDICT #6)."""
        sklearn_metrics = pytest.importorskip('sklearn.metrics')
        from awsegbench.core.mesh import create_mesh
        from awsegbench.metrics.disagreement import auroc_exact_sharded

        n = 10_000_008  # divisible by 8 devices
        rng = np.random.default_rng(3)
        scores = np.round(rng.random(n), 3).astype(np.float32)  # ~1000 ties/level
        labels = (scores + rng.normal(0, 0.25, n) > 0.5).astype(np.float32)
        valid = (rng.random(n) > 0.05).astype(np.float32)

        oracle = sklearn_metrics.roc_auc_score(labels[valid > 0],
                                               scores[valid > 0])
        mesh = create_mesh()
        assert mesh.devices.size == 8
        ours = float(auroc_exact_sharded(jnp.asarray(scores),
                                         jnp.asarray(labels * valid),
                                         jnp.asarray(valid), mesh))
        assert abs(oracle - ours) < 1e-6, (oracle, ours)

    def test_degenerate_returns_half(self):
        scores = jnp.asarray(np.random.rand(100).astype(np.float32))
        assert float(auroc_exact(scores, jnp.zeros(100))) == 0.5
        assert float(auroc_exact(scores, jnp.ones(100))) == 0.5

    def test_facade_auroc(self, random_logits_targets):
        sklearn_metrics = pytest.importorskip('sklearn.metrics')
        logits, targets = random_logits_targets
        l2 = np.random.randn(*logits.shape).astype(np.float32)
        ours = EnsembleDisagreementMetrics().compute_disagreement_auroc(
            [logits, l2], targets)

        # sklearn oracle replicating metrics.py:393-438
        p = torch.stack([F.softmax(torch.from_numpy(logits), 1),
                         F.softmax(torch.from_numpy(l2), 1)], 0)
        mp = p.mean(0)
        me = -torch.sum(mp * torch.log(mp + 1e-8), dim=1)
        ie = -torch.sum(p * torch.log(p + 1e-8), dim=2)
        dis = (me - ie.mean(0)).numpy().reshape(-1)
        err = (mp.argmax(1).numpy() != targets).astype(np.float32).reshape(-1)
        keep = targets.reshape(-1) != 255
        oracle = sklearn_metrics.roc_auc_score(err[keep], dis[keep])
        assert abs(ours - oracle) < 1e-5


class TestRobustness:
    def test_degradation_ratio_quirks(self):
        rm = RobustnessMetrics(5)
        assert rm.compute_robustness_degradation_ratio(0.0, 0.5) == 1.0
        assert rm.compute_robustness_degradation_ratio(0.5, 0.6) == 0.0
        assert abs(rm.compute_robustness_degradation_ratio(0.8, 0.6) - 0.25) < 1e-9

    def test_summary(self):
        rm = RobustnessMetrics(5)
        wm = {
            'clean': {'mean_iou': 0.8, 'expected_calibration_error': 0.02},
            'fog': {'mean_iou': 0.6, 'expected_calibration_error': 0.04},
            'rain': {'mean_iou': 0.7, 'expected_calibration_error': 0.06},
        }
        s = rm.create_robustness_summary(wm)
        assert abs(s['robustness_degradation_fog'] - 0.25) < 1e-9
        assert abs(s['robustness_degradation_rain'] - 0.125) < 1e-9
        assert abs(s['robustness_degradation_ratio'] - 0.1875) < 1e-9
        assert abs(s['expected_calibration_error'] - 0.04) < 1e-9

    def test_comprehensive_metrics(self, random_logits_targets):
        logits, targets = random_logits_targets
        rm = RobustnessMetrics(5)
        m = rm.compute_comprehensive_metrics(logits, targets,
                                             weather_condition='fog')
        assert 'mean_iou' in m and 'pixel_accuracy' in m
        assert 'expected_calibration_error' in m
        assert m['miou_fog'] == m['mean_iou']
