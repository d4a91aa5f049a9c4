"""Evaluation harnesses: metrics, defense grid, transfer sweeps, trajectories."""

from .metrics import attack_metrics, expected_calibration_error, ssim, psnr
from .defense_eval import DefenseEvalConfig, evaluate_defenses_batch, aggregate_stats
from .corruptions import CORRUPTION_NAMES, apply_corruption, make_corruption_run
