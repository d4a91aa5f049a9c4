"""White-box attacks in [0,1] pixel space, as fused XLA programs."""

from .api import (ATTACK_NAMES, ATTACK_THREAT, AttackParams,
                  make_ensemble_logits_fn, make_logits_fn, run_attack)
from .fgsm import fgsm_attack
from .pgd import (pgd_l1_attack, pgd_l2_attack, pgd_linf_attack,
                  pgd_multi_restart, project_l1_ball)
from .cw import CWResult, cw_l2_attack
from .mifgsm import mifgsm_attack
from .dim import dim_attack, diverse_input
from .tim import tim_attack
from .apgd import (apgd_attack, apgd_ce_attack, apgd_dlr_attack,
                   apgd_targeted_attack, dlr_loss, dlr_loss_targeted)
from .fab import fab_targeted_attack, project_box_hyperplane
from .square import square_attack, square_l2_attack
from .deepfool import deepfool_attack
from .bandits import bandits_attack
from .grad_est import nes_attack, spsa_attack
from .hsja import hsja_attack
from .ead import EADResult, ead_attack
from .eot import (gaussian_noise_transform, make_eot_logits_fn,
                  universal_perturbation)
from .detector_aware import detector_aware_fgsm, detector_aware_pgd
from .jsma import jsma_attack
from .boundary import boundary_attack
from .simba import dct_basis_image, simba_attack
from .stadv import (StAdvResult, flow_smoothness, flow_warp, stadv_attack)
from .spatial import SpatialResult, affine_warp, spatial_attack
from .uap import UAPResult, apply_uap, uap_attack, uap_fooling_rate
from .patch import (PatchResult, apply_patch, patch_attack,
                    patch_success_rate, sample_placements)
