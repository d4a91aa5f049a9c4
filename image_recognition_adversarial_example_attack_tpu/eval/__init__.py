"""Evaluation harnesses: metrics, defense grid, transfer sweeps, trajectories."""

from .metrics import attack_metrics, ssim, psnr
from .defense_eval import DefenseEvalConfig, evaluate_defenses_batch, aggregate_stats
