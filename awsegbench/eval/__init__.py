"""Evaluation driver and report generation."""

from .evaluator import Evaluator, generate_evaluation_report

__all__ = ["Evaluator", "generate_evaluation_report"]
