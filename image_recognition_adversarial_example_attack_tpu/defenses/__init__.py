"""Input-preprocessing defenses + feature-statistics adversarial detector."""

from .preprocess import defense_smoothing, defense_quantization, defend_input, DefenseConfig
from .detector import feature_score, is_adversarial_by_feature, calibrate_feature_threshold
