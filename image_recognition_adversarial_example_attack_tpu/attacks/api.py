"""Attack dispatch + the model-adapter closure.

TPU-first design: every attack is a pure function of
``(logits_fn, x01, y, config)`` where ``logits_fn(x01) -> [B, K] float32``
hides the model, its variables, its compute dtype, and ImageNet
normalization.  Because attacks never see a framework "module", they jit,
vmap and pjit transparently, and the whole attack (forward+backward, step,
projection, clip — all ``steps`` iterations) compiles to ONE XLA program.

The reference's equivalent surface is ``run_attack``
(defense_experiments.py:534-576), a string dispatcher over eager per-step
Python loops; the dispatch surface and parameter names are preserved here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.constants import (
    DEFAULT_ALPHA,
    DEFAULT_CW_C,
    DEFAULT_CW_KAPPA,
    DEFAULT_CW_LR,
    DEFAULT_EPS,
    DEFAULT_STEPS,
)
from ..core.normalize import normalize_batch

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


def make_logits_fn(
    module: Any,
    variables: dict,
    mean,
    std,
    input_dtype: Any = None,
    method: Any = None,
) -> LogitsFn:
    """Builds ``x01 [B,H,W,C] in [0,1] -> logits [B,K] float32``.

    Normalization happens inside so attacks operate purely in pixel space
    (the reference's invariant, attack.py:30).  ``input_dtype`` lets the
    caller push the normalize+model compute to bfloat16 for the MXU while
    attack state stays float32.  ``method`` applies an alternative module
    method (e.g. the detector's feature tap) through the same closure.
    """

    def logits_fn(x01: jnp.ndarray) -> jnp.ndarray:
        x = x01 if input_dtype is None else x01.astype(input_dtype)
        x = normalize_batch(x, mean, std)
        if method is None:
            out = module.apply(variables, x)
        else:
            out = module.apply(variables, x, method=method)
        return out.astype(jnp.float32)

    return logits_fn


def cross_entropy_sum(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Summed softmax cross-entropy.

    torch ``F.cross_entropy`` defaults to the batch mean (attack.py:31); sum
    differs only by the constant 1/B factor, which is invariant under the
    sign() used by FGSM/PGD and keeps per-sample gradients decoupled.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    return -jnp.sum(picked)


def input_grad(logits_fn: LogitsFn, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """d(CE)/dx only — no parameter gradients exist in the trace, so XLA
    compiles just the data-gradient chain (≈1x forward FLOPs instead of 2x).
    The reference pays the same via ``torch.autograd.grad(..., only_inputs=True)``
    per step from Python (attack.py:32); here it is inside the compiled loop."""
    return jax.grad(lambda xx: cross_entropy_sum(logits_fn(xx), y))(x)


@dataclass(frozen=True)
class AttackParams:
    """Full parameter plumbing for run_attack (cf. defense_experiments.py:534)."""

    eps: float = DEFAULT_EPS
    alpha: float = DEFAULT_ALPHA
    steps: int = DEFAULT_STEPS
    cw_c: float = DEFAULT_CW_C
    cw_kappa: float = DEFAULT_CW_KAPPA
    cw_steps: int = 100
    cw_lr: float = DEFAULT_CW_LR
    random_start: bool = True
    mu: float = 1.0  # MI-FGSM momentum decay
    # Square is query-based: its budget is queries, not gradient steps —
    # reusing `steps` (default 10) would silently cripple it
    square_steps: int = 1000
    # DeepFool converges in few iterations but needs more than PGD's 10
    deepfool_steps: int = 50
    deepfool_classes: int = 10
    deepfool_overshoot: float = 0.02
    # NES/SPSA gradient-estimation budgets (probe pairs per step)
    est_samples: int = 32
    nes_sigma: float = 1e-3
    spsa_delta: float = 1e-2
    # Bandits-TD (time+data priors): 2 queries/step, so 500 steps = the
    # 1000-query budget used for the other query attacks; the latent
    # prior lattice is H/prior_factor x W/prior_factor
    bandits_steps: int = 500
    bandits_prior_factor: int = 8
    bandits_fd_eta: float = 0.1
    bandits_delta: float = 0.1
    bandits_prior_lr: float = 1.0
    # HSJA decision-based budgets (outer iterations / probes per estimate)
    hsja_steps: int = 10
    hsja_probes: int = 32
    # EAD elastic-net budgets.  NOT shared with CW's c/lr: CW's Adam
    # normalizes step sizes so c=1, lr=0.01 works there, but EAD's raw-
    # gradient FISTA steps need lr*c*|grad| to clear the beta threshold
    # or the shrinkage returns every pixel to x0 (see attacks/ead.py) —
    # these defaults sit in the measured working regime at steps=100
    ead_beta: float = 1e-3
    ead_c: float = 50.0
    ead_lr: float = 0.05
    # APGD-T / FAB-T restart budget: top-K runner-up classes of the clean
    # logits (the AutoAttack convention; full protocol uses 9)
    n_target_classes: int = 9
    # stAdv flow-field budgets (non-Lp: eps/alpha don't apply; the flow
    # regularizer tau is the knob that trades success for smoothness)
    stadv_steps: int = 200
    stadv_lr: float = 0.01
    stadv_tau: float = 0.05
    # Boundary-walk budgets (decision-based: 2 hard-label queries/step;
    # step sizes self-adapt from these per-sample initial values)
    boundary_steps: int = 500
    boundary_spherical_step: float = 0.01
    boundary_source_step: float = 0.01
    # SimBA budgets (score-based: <=2 probability queries/step)
    simba_steps: int = 1000
    simba_eps: float = 0.2
    simba_mode: str = "dct"
    # JSMA L0 budget: max features changed (greedy, one per step) and the
    # per-feature move magnitude (1.0 = saturate to the [0,1] bound)
    jsma_steps: int = 100
    jsma_theta: float = 1.0
    # SLIDE (pgd_l1) top-|grad| coordinate fraction per step
    l1_sparsity: float = 0.01
    # Spatial (rotation+translation; Engstrom et al. 2019) search — non-Lp:
    # the transform bounds, not eps, define the budget.  The search set is
    # worst-of-spatial_candidates random draws UNION an exhaustive
    # rot x trans x trans grid; either part is disabled by zeroing it
    spatial_max_rot: float = 30.0
    spatial_max_trans: float = 0.1
    spatial_candidates: int = 10
    spatial_grid_rot: int = 0
    spatial_grid_trans: int = 0


def make_ensemble_logits_fn(logits_fns, weights=None) -> LogitsFn:
    """Weighted mean of member logits: attack N source models as ONE fused
    program (the logit-fusion ensemble of Dong et al., CVPR 2018 —
    beyond-reference; the reference attacks a single source).

    All members' parameters live on the device (replicated on the mesh);
    XLA compiles the N forwards and the fused backward into a single
    program, so an ensemble attack costs one compile and zero host trips,
    exactly like a single-model attack.
    """
    fns = list(logits_fns)
    if not fns:
        raise ValueError("ensemble needs at least one member")
    if weights is None:
        w = [1.0 / len(fns)] * len(fns)
    else:
        w = [float(v) for v in weights]
        if len(w) != len(fns):
            raise ValueError(f"{len(w)} weights for {len(fns)} members")
        total = sum(w)
        if total <= 0:
            raise ValueError("ensemble weights must sum to a positive value")
        w = [v / total for v in w]

    def ensemble(x):
        outs = [fn(x) for fn in fns]
        shapes = {tuple(o.shape) for o in outs}
        if len(shapes) != 1:
            raise ValueError(
                "ensemble members disagree on logits shape "
                f"{sorted(shapes)} — members must share one class space"
            )
        out = w[0] * outs[0]
        for wi, o in zip(w[1:], outs[1:]):
            out = out + wi * o
        return out

    return ensemble


# ---------------------------------------------------------------------------
# The zoo registry.  Every member registers a handler AND its threat model,
# so the registry-driven invariant sweep (tests/test_zoo_invariants.py)
# covers new attacks automatically — an attack cannot land in run_attack
# without declaring how its output is bounded.
#
# Threat models:
#   "linf" / "l2" / "l1"  — eps-ball in that norm around x,
#   "l0"                  — at most ``jsma_steps`` coordinates changed,
#   "none"                — minimal-norm or non-Lp attacks; only the
#                           [0,1]-range / shape / determinism invariants apply.
_DISPATCH: dict[str, Callable[..., jnp.ndarray]] = {}
ATTACK_THREAT: dict[str, str] = {}


def _register(name: str, threat: str):
    if threat not in ("linf", "l2", "l1", "l0", "none"):
        raise ValueError(f"unknown threat model '{threat}'")

    def deco(fn):
        _DISPATCH[name] = fn
        ATTACK_THREAT[name] = threat
        return fn

    return deco


def run_attack(
    attack_name: str,
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    params: AttackParams,
    key: jax.Array | None = None,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """String dispatch: 'fgsm' | 'pgd' | 'pgd_l2' | 'pgd_l1' | 'cw' | 'mifgsm' | 'dim'
    | 'tim' | 'apgd' | 'apgd_dlr' | 'apgd_t' | 'fab' | 'square'
    | 'deepfool' | 'nes' | 'spsa' | 'bandits' | 'hsja' | 'ead' | 'stadv'
    | 'boundary' | 'simba' | 'jsma' | 'spatial' -> x_adv in [0,1].

    'jsma' is the L0 greedy saliency attack (budgets jsma_steps/
    jsma_theta; eps does not apply; targeted via ``y_target``, default
    target = the clean runner-up class).

    'mifgsm'/'dim'/'tim' (transfer family), 'apgd' (adaptive robust eval),
    'square' (gradient-free black-box; budget = params.square_steps),
    'deepfool' (minimal-L2, attacks the model's own prediction),
    'nes'/'spsa' (query-based gradient estimation), 'bandits' (query-based
    with time+data priors — Ilyas et al. 2019; budgets bandits_steps at 2
    queries/step, latent lattice bandits_prior_factor), 'hsja' (decision-based:
    hard labels only), 'ead' (elastic-net L1; cw_steps/cw_kappa budgets
    with its own ead_c/ead_lr/ead_beta — FISTA needs larger steps than
    CW's Adam), 'boundary' (the original decision-based walk — hard
    labels only, closest-L2 tracking like hsja), 'simba' (score-based
    coordinate descent on p_y over the pixel or low-frequency DCT basis),
    'stadv' (non-Lp: optimizes a smooth flow FIELD, not pixel
    values — eps does not apply; budgets stadv_steps/stadv_lr/stadv_tau,
    targeted via ``y_target``), and the ``y_target`` targeted modes for
    fgsm/pgd/mifgsm/dim/tim/nes/spsa/ead are beyond-reference extensions; they
    plug into every harness accepting an attack name.  'spatial' is the
    worst-case rotation+translation search (Engstrom et al. 2019; non-Lp —
    budgets spatial_max_rot/spatial_max_trans; search = worst-of-
    spatial_candidates random draws union a
    spatial_grid_rot x spatial_grid_trans^2 grid).  'apgd', 'square',
    'deepfool', 'hsja', 'boundary', 'simba' and 'spatial' are
    untargeted-only and reject ``y_target``.
    """
    try:
        handler = _DISPATCH[attack_name]
    except KeyError:
        raise ValueError(f"unknown attack '{attack_name}'") from None
    if key is None:
        key = jax.random.PRNGKey(0)
    return handler(logits_fn, x, y_true, params, key, y_target)


@_register("fgsm", "linf")
def _run_fgsm(logits_fn, x, y_true, params, key, y_target):
    from .fgsm import fgsm_attack

    return fgsm_attack(logits_fn, x, y_true, eps=params.eps, y_target=y_target)


@_register("mifgsm", "linf")
def _run_mifgsm(logits_fn, x, y_true, params, key, y_target):
    from .mifgsm import mifgsm_attack

    return mifgsm_attack(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.steps, mu=params.mu,
        y_target=y_target,
    )


@_register("dim", "linf")
def _run_dim(logits_fn, x, y_true, params, key, y_target):
    from .dim import dim_attack

    return dim_attack(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.steps, mu=params.mu,
        key=key, y_target=y_target,
    )


@_register("tim", "linf")
def _run_tim(logits_fn, x, y_true, params, key, y_target):
    from .tim import tim_attack

    return tim_attack(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.steps, mu=params.mu,
        y_target=y_target,
    )


@_register("apgd", "linf")
def _run_apgd(logits_fn, x, y_true, params, key, y_target):
    from .apgd import apgd_ce_attack

    if y_target is not None:
        raise ValueError("apgd here is the untargeted CE variant")
    return apgd_ce_attack(
        logits_fn, x, y_true, eps=params.eps, steps=params.steps, key=key,
    )


@_register("apgd_dlr", "linf")
def _run_apgd_dlr(logits_fn, x, y_true, params, key, y_target):
    from .apgd import apgd_dlr_attack

    if y_target is not None:
        raise ValueError("apgd_dlr is the untargeted DLR variant")
    return apgd_dlr_attack(
        logits_fn, x, y_true, eps=params.eps, steps=params.steps, key=key,
    )


@_register("apgd_t", "linf")
def _run_apgd_t(logits_fn, x, y_true, params, key, y_target):
    from .apgd import apgd_targeted_attack

    if y_target is not None:
        raise ValueError(
            "apgd_t picks its own top-K targets (n_target_classes)")
    x_adv, _ = apgd_targeted_attack(
        logits_fn, x, y_true, eps=params.eps, steps=params.steps,
        n_targets=params.n_target_classes, key=key,
    )
    return x_adv


@_register("fab", "linf")
def _run_fab(logits_fn, x, y_true, params, key, y_target):
    from .fab import fab_targeted_attack

    if y_target is not None:
        raise ValueError(
            "fab is the targeted-restart minimal-norm variant; it picks "
            "its own top-K targets (n_target_classes)")
    x_fab = fab_targeted_attack(
        logits_fn, x, y_true, eps=params.eps, steps=params.steps,
        n_targets=params.n_target_classes, key=key,
    )
    # FAB is norm-MINIMIZING: its best iterate may lie far outside the
    # eps ball.  Grid harnesses count plain misclassification per eps
    # cell, so an out-of-ball iterate would inflate every small-eps
    # cell; per the AutoAttack convention an out-of-ball FAB result
    # simply does not count — return the clean input for those samples
    # (eval/robust_eval.py applies the same in_ball mask).
    in_ball = jnp.max(jnp.abs(x_fab - x), axis=(1, 2, 3)) <= params.eps + 1e-6
    return jnp.where(in_ball[:, None, None, None], x_fab, x)


def _run_square_family(logits_fn, x, y_true, params, key, y_target, *, l2):
    from .square import square_attack, square_l2_attack

    if y_target is not None:
        raise ValueError("square is the untargeted margin-loss variant")
    fn = square_l2_attack if l2 else square_attack
    return fn(
        logits_fn, x, y_true, eps=params.eps, steps=params.square_steps,
        key=key,
    )


_register("square", "linf")(
    lambda *a: _run_square_family(*a, l2=False))
_register("square_l2", "l2")(
    lambda *a: _run_square_family(*a, l2=True))


@_register("deepfool", "none")
def _run_deepfool(logits_fn, x, y_true, params, key, y_target):
    from .deepfool import deepfool_attack

    if y_target is not None:
        raise ValueError("deepfool flips the model's own prediction; untargeted-only")
    return deepfool_attack(
        logits_fn, x, y_true,
        steps=params.deepfool_steps,
        num_classes=params.deepfool_classes,
        overshoot=params.deepfool_overshoot,
    )


@_register("bandits", "linf")
def _run_bandits(logits_fn, x, y_true, params, key, y_target):
    from .bandits import bandits_attack

    return bandits_attack(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.bandits_steps,
        key=key, prior_factor=params.bandits_prior_factor,
        fd_eta=params.bandits_fd_eta, delta=params.bandits_delta,
        prior_lr=params.bandits_prior_lr, y_target=y_target,
    )


@_register("nes", "linf")
def _run_nes(logits_fn, x, y_true, params, key, y_target):
    from .grad_est import nes_attack

    return nes_attack(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.steps, key=key,
        n_samples=params.est_samples, sigma=params.nes_sigma,
        y_target=y_target,
    )


@_register("spsa", "linf")
def _run_spsa(logits_fn, x, y_true, params, key, y_target):
    from .grad_est import spsa_attack

    return spsa_attack(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.steps, key=key,
        n_samples=params.est_samples, delta=params.spsa_delta,
        y_target=y_target,
    )


@_register("hsja", "none")
def _run_hsja(logits_fn, x, y_true, params, key, y_target):
    from .hsja import hsja_attack

    if y_target is not None:
        raise ValueError("hsja here is the untargeted decision-based variant")
    return hsja_attack(
        logits_fn, x, y_true,
        steps=params.hsja_steps, n_probes=params.hsja_probes, key=key,
    )


@_register("pgd_l1", "l1")
def _run_pgd_l1(logits_fn, x, y_true, params, key, y_target):
    from .pgd import pgd_l1_attack

    return pgd_l1_attack(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.steps,
        key=key, sparsity=params.l1_sparsity,
        random_start=params.random_start, y_target=y_target,
    )


def _run_pgd_family(logits_fn, x, y_true, params, key, y_target, *, l2):
    from .pgd import pgd_l2_attack, pgd_linf_attack

    fn = pgd_l2_attack if l2 else pgd_linf_attack
    return fn(
        logits_fn, x, y_true,
        eps=params.eps, alpha=params.alpha, steps=params.steps,
        random_start=params.random_start, key=key, y_target=y_target,
    )


_register("pgd", "linf")(
    lambda *a: _run_pgd_family(*a, l2=False))
_register("pgd_l2", "l2")(
    lambda *a: _run_pgd_family(*a, l2=True))


@_register("ead", "none")
def _run_ead(logits_fn, x, y_true, params, key, y_target):
    from .ead import ead_attack

    res = ead_attack(
        logits_fn, x, y_true,
        c=params.ead_c, kappa=params.cw_kappa, beta=params.ead_beta,
        steps=params.cw_steps, lr=params.ead_lr,
        targeted=y_target is not None, y_target=y_target,
    )
    return res.x_adv


@_register("boundary", "none")
def _run_boundary(logits_fn, x, y_true, params, key, y_target):
    from .boundary import boundary_attack

    if y_target is not None:
        raise ValueError("boundary here is the untargeted walk")
    return boundary_attack(
        logits_fn, x, y_true,
        steps=params.boundary_steps,
        spherical_step=params.boundary_spherical_step,
        source_step=params.boundary_source_step,
        key=key,
    )


@_register("simba", "none")
def _run_simba(logits_fn, x, y_true, params, key, y_target):
    from .simba import simba_attack

    if y_target is not None:
        raise ValueError("simba descends the true-class probability; untargeted-only")
    return simba_attack(
        logits_fn, x, y_true,
        steps=params.simba_steps, eps=params.simba_eps,
        mode=params.simba_mode, key=key,
    )


@_register("jsma", "l0")
def _run_jsma(logits_fn, x, y_true, params, key, y_target):
    from .jsma import jsma_attack

    return jsma_attack(
        logits_fn, x, y_true,
        steps=params.jsma_steps, theta=params.jsma_theta,
        y_target=y_target,
    )


@_register("spatial", "none")
def _run_spatial(logits_fn, x, y_true, params, key, y_target):
    from .spatial import spatial_attack

    if y_target is not None:
        raise ValueError("spatial is the untargeted worst-of-k search")
    res = spatial_attack(
        logits_fn, x, y_true,
        max_rot=params.spatial_max_rot,
        max_trans=params.spatial_max_trans,
        candidates=params.spatial_candidates,
        grid_rot=params.spatial_grid_rot,
        grid_trans=params.spatial_grid_trans,
        key=key,
    )
    return res.x_adv


@_register("stadv", "none")
def _run_stadv(logits_fn, x, y_true, params, key, y_target):
    from .stadv import stadv_attack

    res = stadv_attack(
        logits_fn, x, y_true,
        steps=params.stadv_steps, lr=params.stadv_lr,
        tau=params.stadv_tau, kappa=params.cw_kappa,
        y_target=y_target,
    )
    return res.x_adv


@_register("cw", "none")
def _run_cw(logits_fn, x, y_true, params, key, y_target):
    from .cw import cw_l2_attack

    res = cw_l2_attack(
        logits_fn, x, y_true,
        c=params.cw_c, kappa=params.cw_kappa, steps=params.cw_steps,
        lr=params.cw_lr, targeted=y_target is not None, y_target=y_target,
    )
    return res.x_adv


# The canonical zoo roster, in registration order (registry-driven: harnesses
# and the invariant sweep iterate this, never a hand-maintained list).
ATTACK_NAMES: tuple[str, ...] = tuple(_DISPATCH)
