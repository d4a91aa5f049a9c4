"""Input-preprocessing defenses + adversarial detectors + certified smoothing."""

from .preprocess import defense_smoothing, defense_quantization, defend_input, DefenseConfig
from .jpeg_dct import jpeg_dct_roundtrip
from .detector import (
    calibrate_feature_threshold,
    calibrate_squeezing_threshold,
    feature_score,
    is_adversarial_by_feature,
    is_adversarial_by_squeezing,
    squeezing_score,
)
from .mahalanobis import (MahalanobisParams, calibrate_mahalanobis,
                          fit_mahalanobis, is_adversarial_by_mahalanobis,
                          mahalanobis_score)
from .randomization import (random_resize_pad, resize_pad,
                            resize_pad_transform)
from .tv import total_variation, tv_minimize, tv_transform
from .smoothing import ABSTAIN, SmoothedClassifier, SmoothingConfig
from .ibp import (interval_propagate, logit_bounds, make_verify_fn,
                  pixel_bounds, spec_forward, verified_margin,
                  worst_case_logits)
from .crown_ibp import (crown_backward_bound, crown_ibp_margin,
                        interval_trace, make_crown_verify_fn)
