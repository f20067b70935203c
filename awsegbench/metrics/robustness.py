"""Comprehensive robustness metrics facade.

Reference-compatible ``RobustnessMetrics`` (metrics.py:470-652) composing
IoU, calibration, and disagreement metrics; plus the degradation-ratio and
summary logic with the reference's quirks preserved:

* degradation ratio clamps at 0 and returns 1.0 when clean mIoU is 0
  (metrics.py:559-563)
* summary averages degradations/ECE/AUROC across weathers (metrics.py:607-652)
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .calibration import ConfidenceCalibration
from .disagreement import EnsembleDisagreementMetrics
from .iou import IoUMetrics


class RobustnessMetrics:
    def __init__(self, num_classes: int = 19,
                 weather_conditions: Optional[List[str]] = None) -> None:
        self.num_classes = num_classes
        self.weather_conditions = weather_conditions or ['clean', 'fog', 'rain', 'snow', 'night']
        self.iou_metrics = IoUMetrics(num_classes)
        self.calibration_metrics = ConfidenceCalibration()
        self.ensemble_metrics = EnsembleDisagreementMetrics()

    def compute_miou(self, predictions, targets) -> float:
        return self.iou_metrics.compute_iou(predictions, targets)['mean_iou']

    def compute_weather_specific_metrics(self, predictions_dict: Dict,
                                         targets_dict: Dict) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        for weather in self.weather_conditions:
            if weather in predictions_dict and weather in targets_dict:
                preds = predictions_dict[weather]
                tgts = targets_dict[weather]
                if len(preds) > 0 and len(tgts) > 0:
                    metrics[f'miou_{weather}'] = self.compute_miou(preds, tgts)
        return metrics

    @staticmethod
    def compute_robustness_degradation_ratio(clean_miou: float,
                                             adverse_miou: float) -> float:
        if clean_miou == 0:
            return 1.0
        return max(0.0, (clean_miou - adverse_miou) / clean_miou)

    def compute_comprehensive_metrics(self, predictions, targets,
                                      ensemble_predictions: Optional[List] = None,
                                      weather_condition: str = 'clean') -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        iou_results = self.iou_metrics.compute_iou(predictions, targets)
        metrics['mean_iou'] = iou_results['mean_iou']
        metrics['pixel_accuracy'] = self.iou_metrics.compute_pixel_accuracy(predictions, targets)
        metrics['expected_calibration_error'] = self.calibration_metrics.compute_ece(
            predictions, targets)
        if ensemble_predictions and len(ensemble_predictions) >= 2:
            metrics['ensemble_disagreement_auroc'] = (
                self.ensemble_metrics.compute_disagreement_auroc(
                    ensemble_predictions, targets))
        metrics[f'miou_{weather_condition}'] = metrics['mean_iou']
        return metrics

    def create_robustness_summary(self, weather_metrics: Dict[str, Dict[str, float]]
                                  ) -> Dict[str, float]:
        summary: Dict[str, float] = {}
        clean_miou = weather_metrics.get('clean', {}).get('mean_iou', 0.0)

        for weather in ['fog', 'rain', 'snow', 'night']:
            if weather in weather_metrics:
                adverse_miou = weather_metrics[weather].get('mean_iou', 0.0)
                summary[f'robustness_degradation_{weather}'] = (
                    self.compute_robustness_degradation_ratio(clean_miou, adverse_miou))

        degradations = [summary[f'robustness_degradation_{w}']
                        for w in ['fog', 'rain', 'snow', 'night']
                        if f'robustness_degradation_{w}' in summary]
        if degradations:
            summary['robustness_degradation_ratio'] = float(np.mean(degradations))

        eces = [m.get('expected_calibration_error', 0.0) for m in weather_metrics.values()]
        if eces:
            summary['expected_calibration_error'] = float(np.mean(eces))

        aurocs = [m.get('ensemble_disagreement_auroc', 0.5) for m in weather_metrics.values()]
        if aurocs:
            summary['ensemble_disagreement_auroc'] = float(np.mean(aurocs))

        return summary
