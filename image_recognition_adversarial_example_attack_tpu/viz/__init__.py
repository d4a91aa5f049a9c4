"""Host-side visualization: plots and JSON reports (terminal layer)."""

from .plots import (
    plot_defense_heatmaps,
    plot_attack_samples,
    plot_transfer_heatmap,
    plot_attack_grid,
    plot_attack_trajectory,
    plot_perturbation_analysis,
    plot_blackbox_pair,
)
