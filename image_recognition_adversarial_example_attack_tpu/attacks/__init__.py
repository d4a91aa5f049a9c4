"""White-box attacks in [0,1] pixel space, as fused XLA programs."""

from .api import AttackParams, make_logits_fn, run_attack
from .fgsm import fgsm_attack
from .pgd import pgd_linf_attack
from .cw import CWResult, cw_l2_attack
from .mifgsm import mifgsm_attack
