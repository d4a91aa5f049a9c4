"""PGD adversarial training (Madry et al., ICLR 2018), TPU-native.

Beyond-reference capability: the reference CONSUMES an adversarially
trained checkpoint (RobustBench Engstrom2019Robustness,
defense_experiments.py:674-686) but cannot produce one.  This module
closes that loop: it fine-tunes any zoo model with on-the-fly PGD
adversarial examples, producing checkpoints the robust arm and the
converter round-trip natively (msgpack, same variable tree).

TPU design — the WHOLE training step is ONE jitted program:

    train_step(state, x, y, key) =
      scan: PGD attack on the CURRENT params   (k fwd + k bwd-to-input)
      stop_gradient(x_adv)                     (attack is data, not graph)
      value_and_grad wrt params on x_adv       (1 fwd + 1 bwd-to-params)
      optax update + apply                     (fused elementwise)

Under a ('data','model') mesh the batch shards over 'data' and XLA
inserts the gradient psum over ICI — no hand-written collectives (the
same scale-out contract as the eval stack, parallel/mesh.py).

BatchNorm note: by default zoo models run BN in inference mode (frozen
running stats — models/resnet.py), the standard setting for robust
FINE-TUNING.  For FROM-SCRATCH training (the CIFAR family),
``config.train_bn`` switches every forward to batch-statistics BN and
``calibrate_batch_stats`` recalibrates the running stats once at export
(precise-BN), so the deployed checkpoint is a standard inference model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..attacks.pgd import pgd_linf_attack
from ..core.constants import IMAGENET_MEAN, IMAGENET_STD
from ..core.normalize import normalize_batch


@dataclass(frozen=True)
class AdvTrainConfig:
    """Static (compile-time) training-step configuration."""

    eps: float = 8 / 255
    alpha: float = 2 / 255
    attack_steps: int = 7          # Madry's PGD-7
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    label_smoothing: float = 0.0
    clean_weight: float = 0.0      # >0: mixes clean CE into the PGD-AT loss
    trades_beta: float = 6.0       # robustness/accuracy trade-off (TRADES)
    mart_beta: float = 5.0         # misclassification-aware KL weight (MART)
    # >0: Gaussian-noise training for randomized smoothing.  The PGD inner
    # maximization attacks the EOT-smoothed model (noise_samples draws —
    # SmoothAdv, Salman et al. 2019) and the outer CE is evaluated on
    # noisy inputs (Cohen et al.'s augmentation); attack_steps=0 recovers
    # plain Gaussian augmentation.
    noise_sigma: float = 0.0
    noise_samples: int = 4
    # The two standard TPU memory levers, both inside the ONE jitted step:
    # grad_accum>1 scans the batch in grad_accum micro-batches, so only one
    # micro-batch's activations are ever live (effective batch unchanged —
    # grads are averaged across micro-batches before the single optimizer
    # update); remat wraps the model forward in jax.checkpoint, trading one
    # extra forward in the backward pass for dropping all intermediate
    # activations from HBM.  Together they bound peak memory at
    # O(model + batch/grad_accum inputs) instead of O(model + batch
    # activations) — how ImageNet-scale effective batches fit one chip.
    grad_accum: int = 1
    remat: bool = False
    # Learning-rate schedule: 'constant' (reference-free default) or
    # 'cosine' (linear warmup over warmup_steps to learning_rate, cosine
    # decay to zero over total_steps — the standard AT recipe).  The
    # schedule rides optax's update count inside opt_state, so checkpoint
    # resume continues it exactly.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 0           # required (>0) for 'cosine'
    # 'free' objective: batch replays per optimizer step (Shafahi et al.
    # 2019) — each replay does a full parameter update AND an FGSM update
    # of the carried perturbation from the same backward pass.
    free_replays: int = 4
    # Batch-statistics BatchNorm for FROM-SCRATCH training (the CIFAR
    # family): every forward inside the step normalizes by the current
    # batch's statistics; running stats are NOT tracked during training
    # and are recalibrated once at export by ``calibrate_batch_stats``
    # (the 'precise BN' recipe) so the deployed checkpoint is a standard
    # inference-mode model.  Off (default) = frozen running stats, the
    # robust FINE-TUNING setting.
    train_bn: bool = False
    # IBP certified training (make_ibp_step; Gowal et al. 2018): the loss
    # is kappa_t*CE(clean) + (1-kappa_t)*CE(worst-case logits at eps_t),
    # with eps_t ramped 0 -> eps and kappa_t ramped 1 -> ibp_kappa over
    # the first ibp_ramp_steps optimizer steps (the standard warm-up that
    # keeps early training from collapsing under vacuous bounds).  The
    # ramp rides state.step INSIDE the jitted program, so one compiled
    # step serves the whole schedule and checkpoint resume continues it
    # exactly.  ibp_ramp_steps=0 trains at full eps from step 0.
    ibp_ramp_steps: int = 0
    ibp_kappa: float = 0.5
    # 'crown' switches the certified objective to CROWN-IBP (Zhang et
    # al. 2020): the robust CE runs on margins mixed as
    # ``beta_t*CROWN + (1-beta_t)*IBP`` with beta_t ramped 1 ->
    # ibp_final_beta over the same ibp_ramp_steps schedule (the paper's
    # recipe: tight backward bounds guide early training, pure IBP
    # — final_beta 0 — takes over for the deployed certificate).
    ibp_bound: str = "ibp"
    ibp_final_beta: float = 0.0
    # Input augmentation (train/augment.py), applied to the clean batch
    # INSIDE the compiled step before the inner maximization (augment ->
    # attack -> update, the standard AT order): aug_pad>0 = zero-pad +
    # random crop, aug_flip = horizontal flip p=0.5, aug_cutout>0 = one
    # zeroed square per image.  All-off (default) is bitwise identical
    # to the pre-augmentation step (no extra key split).
    aug_pad: int = 0
    aug_flip: bool = False
    aug_cutout: int = 0
    # >0: maintain an exponential moving average of the parameters
    # (theta_ema <- d*theta_ema + (1-d)*theta after every optimizer step,
    # initialized AT the initial parameters so no bias correction is
    # needed).  EMA weights are the standard deployment artifact for
    # adversarially trained models (used by e.g. Carmon et al. 2019,
    # Gowal et al. 2020); the update is one fused elementwise map inside
    # the same XLA program as the optimizer step.
    ema_decay: float = 0.0


class TrainState(struct.PyTreeNode):
    """Parameters + optimizer state + step counter (a jit-able pytree)."""

    params: Any
    extra_variables: Any           # batch_stats etc., frozen during AT
    opt_state: Any
    step: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    ema_params: Any = None         # EMA shadow (None = EMA disabled)
    # static: apply_fn is a train-mode-BN module (forwards pass
    # mutable=['batch_stats'] and discard the updates)
    train_bn: bool = struct.field(pytree_node=False, default=False)


def make_lr_schedule(config: AdvTrainConfig):
    """The scalar-or-schedule optax consumes.

    Plain constant stays a FLOAT (not optax.constant_schedule): a float
    keeps adamw's opt_state tree schedule-free, so checkpoints written
    before schedules existed keep loading."""
    if config.lr_schedule == "constant":
        if config.warmup_steps > 0:
            return optax.linear_schedule(0.0, config.learning_rate,
                                         config.warmup_steps)
        return config.learning_rate
    if config.lr_schedule == "cosine":
        if config.total_steps <= 0:
            raise ValueError("lr_schedule='cosine' needs total_steps > 0")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=config.learning_rate,
            warmup_steps=max(0, int(config.warmup_steps)),
            decay_steps=int(config.total_steps))
    raise ValueError(f"unknown lr_schedule '{config.lr_schedule}'")


def _make_optimizer(config: AdvTrainConfig) -> optax.GradientTransformation:
    return optax.adamw(make_lr_schedule(config),
                       weight_decay=config.weight_decay)


def train_state_from_bundle(bundle, config: AdvTrainConfig) -> TrainState:
    """Build a TrainState from a zoo ModelBundle (models/zoo.py).

    With ``config.train_bn`` the module is rebuilt in batch-statistics
    BN mode (same parameter tree — only the normalization statistics
    source changes); models without a ``train_bn`` attribute (the
    ImageNet fine-tuning families) reject the flag loudly."""
    module = bundle.module
    if config.train_bn:
        if not hasattr(module, "train_bn"):
            raise ValueError(
                f"model '{bundle.name}' does not support train_bn "
                "(from-scratch BN training is a CIFAR-family feature; "
                "the ImageNet families fine-tune with frozen statistics)")
        module = module.clone(train_bn=True)
    variables = dict(bundle.variables)
    params = variables.pop("params")
    tx = _make_optimizer(config)
    return TrainState(
        params=params,
        extra_variables=variables,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        tx=tx,
        apply_fn=module.apply,
        ema_params=(jax.tree.map(jnp.asarray, params)
                    if config.ema_decay > 0.0 else None),
        train_bn=bool(config.train_bn),
    )


def _ce_loss(logits: jnp.ndarray, y: jnp.ndarray, smoothing: float) -> jnp.ndarray:
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    if smoothing > 0.0:
        target = optax.smooth_labels(jax.nn.one_hot(y, n), smoothing)
        return -jnp.mean(jnp.sum(target * logp, axis=-1))
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))


def _finish_step(state: TrainState, grads, metrics, ema_decay: float = 0.0):
    """Shared tail of every objective: one optimizer update + grad_norm
    (+ the EMA shadow update when enabled — fused into the same program)."""
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(params=params, opt_state=opt_state,
                              step=state.step + 1)
    if state.ema_params is not None and ema_decay > 0.0:
        d = jnp.float32(ema_decay)
        ema = jax.tree.map(
            lambda e, p: (d * e.astype(jnp.float32)
                          + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
            state.ema_params, params)
        new_state = new_state.replace(ema_params=ema)
    metrics = dict(metrics)
    # on the AVERAGED gradient — the one the optimizer actually consumes
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def _augment_fn(config: AdvTrainConfig):
    """The step's augmentation callable (or None when the policy is empty)."""
    from .augment import AugmentConfig, make_augment_fn

    return make_augment_fn(AugmentConfig(pad=int(config.aug_pad),
                                         flip=bool(config.aug_flip),
                                         cutout=int(config.aug_cutout)))


def _with_augment(grads_fn, config: AdvTrainConfig):
    """Lift ``grads_fn(state, x01, y, key)`` to augment the FULL batch
    first (before any grad-accum micro-batching), inside the same compiled
    program.  With an empty policy this returns ``grads_fn`` unchanged —
    no key split, so disabled augmentation is bitwise-identical."""
    augment = _augment_fn(config)
    if augment is None:
        return grads_fn

    def fn(state, x01, y, key):
        k_aug, key = jax.random.split(key)
        return grads_fn(state, augment(k_aug, x01), y, key)

    return fn


def _with_grad_accum(grads_fn, accum: int):
    """Lift ``grads_fn(state, x01, y, key) -> (grads, metrics)`` from one
    micro-batch to a full batch of ``accum`` micro-batches via lax.scan.

    The scan serializes the micro-batches inside the SAME compiled program,
    so peak activation memory is one micro-batch's worth while the returned
    gradient is the exact mean over the full batch (mean-of-means with
    equal micro sizes; batch must divide evenly — checked at trace time).
    Scalar metrics average the same way.  Each micro-batch folds its index
    into the step key, so PGD random starts/noise draws stay independent.
    """
    if accum <= 1:
        return grads_fn

    def accum_fn(state: TrainState, x01, y, key):
        b = int(x01.shape[0])
        if b % accum:
            raise ValueError(
                f"batch size {b} is not divisible by grad_accum={accum}")
        micro = b // accum
        xs = x01.reshape(accum, micro, *x01.shape[1:])
        ys = y.reshape(accum, micro)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(accum, dtype=jnp.uint32))

        g_shape, m_shape = jax.eval_shape(
            grads_fn, state, xs[0], ys[0], keys[0])
        zeros = lambda tree: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

        def body(carry, inp):
            g_acc, m_acc = carry
            x_i, y_i, k_i = inp
            g, m = grads_fn(state, x_i, y_i, k_i)
            return (jax.tree.map(jnp.add, g_acc, g),
                    jax.tree.map(jnp.add, m_acc, m)), None

        (g_sum, m_sum), _ = jax.lax.scan(
            body, (zeros(g_shape), zeros(m_shape)), (xs, ys, keys))
        inv = 1.0 / accum
        return (jax.tree.map(lambda t: t * jnp.asarray(inv, t.dtype), g_sum),
                jax.tree.map(lambda t: t * inv, m_sum))

    return accum_fn


def _apply_model(state: TrainState, params, x_norm):
    """One forward that tolerates batch-statistics BN (state.train_bn):
    the per-call running-stat updates are computed and DISCARDED — during
    training the normalization uses the batch statistics themselves, and
    the exported running stats come from one ``calibrate_batch_stats``
    pass at the end."""
    variables = {"params": params, **state.extra_variables}
    if state.train_bn:
        out, _ = state.apply_fn(variables, x_norm, mutable=["batch_stats"])
        return out
    return state.apply_fn(variables, x_norm)


def _make_apply_logits(config: AdvTrainConfig, mean, std):
    """(state, params, x01) -> float32 logits, shared by both objectives.

    Under ``config.remat`` the forward is wrapped in ``jax.checkpoint`` so
    every backward (the attack's bwd-to-input steps and the parameter
    backward) recomputes activations instead of keeping them in HBM."""

    def apply_logits(state: TrainState, params, x01):
        def fwd(params, x01):
            out = _apply_model(state, params, normalize_batch(x01, mean, std))
            return out.astype(jnp.float32)

        if config.remat:
            fwd = jax.checkpoint(fwd)
        return fwd(params, x01)

    return apply_logits


def make_train_step(config: AdvTrainConfig,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """One fused PGD-AT step: (state, x01, y, key) -> (state, metrics).

    ``x01``: [B,H,W,C] pixels in [0,1]; normalization happens inside (the
    same closure convention as the attack stack).  Wrap in ``jax.jit`` (or
    pjit with the batch sharded over 'data') — `config` is closed over as
    a static.
    """
    apply_logits = _make_apply_logits(config, mean, std)

    def loss_fn(params, state: TrainState, x01, y):
        logits = apply_logits(state, params, x01)
        return _ce_loss(logits, y, config.label_smoothing), logits

    def grads_fn(state: TrainState, x01, y, key):
        k_attack, k_eot, k_noise = jax.random.split(key, 3)

        # 1) craft adversarial examples against the CURRENT parameters
        def logits_fn(x01):
            return apply_logits(state, state.params, x01)

        if config.noise_sigma > 0.0:
            # SmoothAdv: the inner maximization attacks the EOT-smoothed
            # model, so the adversarial example targets the classifier
            # randomized smoothing will actually deploy
            from ..attacks.eot import make_eot_logits_fn

            attack_fn = make_eot_logits_fn(
                logits_fn, k_eot, n_samples=config.noise_samples,
                sigma=config.noise_sigma)
        else:
            attack_fn = logits_fn

        if config.attack_steps > 0:
            x_adv = pgd_linf_attack(
                attack_fn, x01, y, eps=config.eps, alpha=config.alpha,
                steps=config.attack_steps, key=k_attack,
            )
            x_adv = jax.lax.stop_gradient(x_adv)  # attack output is data
        else:
            # attack_steps=0 means NO attack at all (not even PGD's random
            # start) — with noise_sigma>0 this is exactly Cohen-style
            # Gaussian augmentation, as the CLI documents
            x_adv = x01

        if config.noise_sigma > 0.0:
            # Cohen-style augmentation: the base classifier trains on a
            # noisy draw of the (adversarial) input
            x_train = x_adv + config.noise_sigma * jax.random.normal(
                k_noise, x_adv.shape, x_adv.dtype)
        else:
            x_train = x_adv

        # 2) parameter gradients on the adversarial batch (+ optional clean)
        def total_loss(params):
            adv_loss, adv_logits = loss_fn(params, state, x_train, y)
            if config.clean_weight > 0.0:
                clean_loss, _ = loss_fn(params, state, x01, y)
                return ((1.0 - config.clean_weight) * adv_loss
                        + config.clean_weight * clean_loss), adv_logits
            return adv_loss, adv_logits

        (loss, adv_logits), grads = jax.value_and_grad(
            total_loss, has_aux=True)(state.params)
        metrics = {
            "loss": loss,
            "adv_accuracy": jnp.mean(
                (jnp.argmax(adv_logits, -1) == y).astype(jnp.float32)),
        }
        return grads, metrics

    grads_full = _with_augment(
        _with_grad_accum(grads_fn, int(config.grad_accum)), config)

    def step(state: TrainState, x01, y, key):
        # optimizer update (XLA fuses; grads psum'd by pjit when sharded)
        return _finish_step(state, *grads_full(state, x01, y, key),
                            ema_decay=config.ema_decay)

    return step


def make_free_step(config: AdvTrainConfig,
                   mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Free adversarial training (Shafahi et al., NeurIPS 2019):
    ``(state, x01, y, key, delta) -> (state, metrics, delta)``.

    The batch is replayed ``config.free_replays`` times inside ONE
    compiled program (lax.scan): every replay takes gradients w.r.t. the
    parameters AND the input from the SAME backward pass, applies a full
    optimizer update, and moves the shared perturbation one FGSM step
    (``delta <- clip(delta + eps*sign(g_x), -eps, eps)``) — adversarial
    examples for ~zero extra cost over natural training.  ``delta``
    [B,H,W,C] is carried by the CALLER across batches (start from zeros),
    per the paper; it is not checkpointed (a resumed run re-warms it in
    one replay cycle).  Train for ~epochs/replays passes to match a
    PGD-AT budget.  Composes with train_bn/remat/EMA; grad_accum and
    noise_sigma do not apply.
    """
    if int(config.grad_accum) > 1:
        raise ValueError("free objective updates parameters every replay; "
                         "grad_accum does not compose with it")
    apply_logits = _make_apply_logits(config, mean, std)
    m = max(1, int(config.free_replays))
    augment = _augment_fn(config)

    def step(state: TrainState, x01, y, key, delta):
        if augment is not None:
            # augment once per BATCH (not per replay) — the carried
            # perturbation keeps chasing one fixed view across replays
            x01 = augment(key, x01)
        else:
            del key  # deterministic: the carried perturbation IS the state

        def replay(carry, _):
            st, d = carry
            x_adv = jnp.clip(x01 + d, 0.0, 1.0)

            def loss_wrt(params, xx):
                logits = apply_logits(st, params, xx)
                return _ce_loss(logits, y, config.label_smoothing), logits

            (loss, logits), (g_p, g_x) = jax.value_and_grad(
                loss_wrt, argnums=(0, 1), has_aux=True)(st.params, x_adv)
            new_st, metrics = _finish_step(
                st, g_p,
                {"loss": loss,
                 "adv_accuracy": jnp.mean(
                     (jnp.argmax(logits, -1) == y).astype(jnp.float32))},
                ema_decay=config.ema_decay)
            d = jnp.clip(d + config.eps * jnp.sign(g_x),
                         -config.eps, config.eps)
            return (new_st, d), metrics

        (state, delta), ms = jax.lax.scan(replay, (state, delta), None,
                                          length=m)
        # mean over replays: the batch's effective training signal
        metrics = jax.tree.map(jnp.mean, ms)
        return state, metrics, delta

    return step


def make_trades_step(config: AdvTrainConfig,
                     mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """One fused TRADES step (Zhang et al., ICML 2019):
    (state, x01, y, key) -> (state, metrics).

    loss = CE(f(x), y) + beta * KL(f(x) || f(x_adv)), with x_adv maximizing
    that KL inside the eps-ball (PGD on the KL with the clean distribution
    frozen; iterate initialized at x + 0.001*N(0,I) as in the paper's code).

    Same one-program contract as ``make_train_step``: the inner
    maximization scan, both forwards, the parameter backward and the optax
    update compile into a single XLA program; under a mesh the batch shards
    over 'data' and gradients psum over ICI.
    """
    apply_logits = _make_apply_logits(config, mean, std)

    def grads_fn(state: TrainState, x01, y, key):
        # 1) inner maximization: PGD on KL(p_clean || p(x_adv)), p_clean frozen
        p_clean = jax.lax.stop_gradient(
            jax.nn.softmax(apply_logits(state, state.params, x01), axis=-1)
        )
        logp_clean = jnp.log(jnp.maximum(p_clean, 1e-12))

        def kl_sum(xa):
            logp_adv = jax.nn.log_softmax(
                apply_logits(state, state.params, xa), axis=-1
            )
            return jnp.sum(p_clean * (logp_clean - logp_adv))

        x_adv0 = jnp.clip(
            x01 + 0.001 * jax.random.normal(key, x01.shape, x01.dtype), 0.0, 1.0
        )

        def body(x_adv, _):
            g = jax.grad(kl_sum)(x_adv)
            x_new = x_adv + config.alpha * jnp.sign(g).astype(x_adv.dtype)
            x_new = jnp.clip(x_new, x01 - config.eps, x01 + config.eps)
            return jnp.clip(x_new, 0.0, 1.0), None

        x_adv, _ = jax.lax.scan(body, x_adv0, None, length=int(config.attack_steps))
        x_adv = jax.lax.stop_gradient(x_adv)

        # 2) parameter gradients on the TRADES objective
        def total_loss(params):
            logits_clean = apply_logits(state, params, x01)
            logits_adv = apply_logits(state, params, x_adv)
            natural = _ce_loss(logits_clean, y, config.label_smoothing)
            p = jax.nn.softmax(logits_clean, axis=-1)
            logp = jax.nn.log_softmax(logits_clean, axis=-1)
            logq = jax.nn.log_softmax(logits_adv, axis=-1)
            robust = jnp.mean(jnp.sum(p * (logp - logq), axis=-1))  # batchmean KL
            return natural + config.trades_beta * robust, (natural, robust, logits_adv)

        (loss, (natural, robust, adv_logits)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(state.params)
        metrics = {
            "loss": loss,
            "natural_loss": natural,
            "robust_kl": robust,
            "adv_accuracy": jnp.mean(
                (jnp.argmax(adv_logits, -1) == y).astype(jnp.float32)),
        }
        return grads, metrics

    grads_full = _with_augment(
        _with_grad_accum(grads_fn, int(config.grad_accum)), config)

    def step(state: TrainState, x01, y, key):
        # 3) optimizer update
        return _finish_step(state, *grads_full(state, x01, y, key),
                            ema_decay=config.ema_decay)

    return step


def make_mart_step(config: AdvTrainConfig,
                   mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """One fused MART step (Wang et al., ICLR 2020):
    (state, x01, y, key) -> (state, metrics).

    loss = BCE(p(x_adv), y)
         + beta * KL(p(x) || p(x_adv)) * (1 - p_y(x))   [per sample, mean]

    where BCE is the paper's *boosted* cross-entropy
    ``-log p_y(x_adv) - log(1 - max_{k!=y} p_k(x_adv))`` (pushes the
    runner-up down, not just the true class up) and the KL regularizer is
    weighted per sample by the clean misclassification probability — hard
    clean examples get the strongest smoothing, the paper's core idea.
    Inner maximization is standard PGD on CE (the paper's setting), so
    third objective next to PGD-AT (make_train_step) and TRADES
    (make_trades_step) with the same one-XLA-program/mesh contract.
    """
    apply_logits = _make_apply_logits(config, mean, std)

    def grads_fn(state: TrainState, x01, y, key):
        # 1) inner maximization: PGD on CE against the current params
        def logits_fn(xx):
            return apply_logits(state, state.params, xx)

        x_adv = pgd_linf_attack(
            logits_fn, x01, y, eps=config.eps, alpha=config.alpha,
            steps=config.attack_steps, key=key,
        )
        x_adv = jax.lax.stop_gradient(x_adv)

        # 2) parameter gradients on the MART objective
        def total_loss(params):
            logits_adv = apply_logits(state, params, x_adv)
            logits_clean = apply_logits(state, params, x01)
            k = logits_adv.shape[-1]
            oh = jax.nn.one_hot(y, k, dtype=logits_adv.dtype)
            p_adv = jax.nn.softmax(logits_adv, axis=-1)
            py_adv = jnp.sum(p_adv * oh, axis=-1)
            top_other = jnp.max(p_adv - oh, axis=-1)  # max over k != y
            bce = jnp.mean(-jnp.log(jnp.maximum(py_adv, 1e-12))
                           - jnp.log(jnp.maximum(1.0 - top_other, 1e-12)))
            p_clean = jax.nn.softmax(logits_clean, axis=-1)
            logp_clean = jnp.log(jnp.maximum(p_clean, 1e-12))
            logq_adv = jax.nn.log_softmax(logits_adv, axis=-1)
            kl = jnp.sum(p_clean * (logp_clean - logq_adv), axis=-1)  # [B]
            py_clean = jnp.sum(p_clean * oh, axis=-1)
            reg = jnp.mean(kl * (1.0 - py_clean))
            return bce + config.mart_beta * reg, (bce, reg, logits_adv)

        (loss, (bce, reg, adv_logits)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(state.params)
        metrics = {
            "loss": loss,
            "bce_loss": bce,
            "weighted_kl": reg,
            "adv_accuracy": jnp.mean(
                (jnp.argmax(adv_logits, -1) == y).astype(jnp.float32)),
        }
        return grads, metrics

    grads_full = _with_augment(
        _with_grad_accum(grads_fn, int(config.grad_accum)), config)

    def step(state: TrainState, x01, y, key):
        return _finish_step(state, *grads_full(state, x01, y, key),
                            ema_decay=config.ema_decay)

    return step


def make_ibp_step(config: AdvTrainConfig, spec: tuple,
                  mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """IBP certified training (Gowal et al. 2018): one fused step of
    ``kappa_t*CE(clean) + (1-kappa_t)*CE(worst-case logits at eps_t)``.

    Unlike the PGD objectives there is no inner maximization at all — the
    adversary is the closed-form interval bound (defenses/ibp.py), so a
    step is ~3 forwards' worth of MXU work (clean + midpoint + radius)
    plus one parameter backward, all in ONE XLA program.  ``spec`` is the
    model's layer-descriptor tuple (models/ibp.py); the eps/kappa ramp is
    a function of ``state.step`` inside the program, so the whole schedule
    compiles once and survives checkpoint resume.  ``key`` is accepted for
    the uniform objective signature but unused (IBP is deterministic).
    """
    from ..defenses.ibp import (logit_bounds, spec_forward,
                                verified_margin, worst_case_logits)

    ramp_steps = max(int(config.ibp_ramp_steps), 0)
    use_crown = config.ibp_bound == "crown"
    if config.ibp_bound not in ("ibp", "crown"):
        raise ValueError(f"unknown ibp_bound '{config.ibp_bound}'")

    def grads_fn(state: TrainState, x01, y, key):
        del key
        step = state.step.astype(jnp.float32)
        ramp = (jnp.clip(step / ramp_steps, 0.0, 1.0) if ramp_steps > 0
                else jnp.float32(1.0))
        eps_t = jnp.float32(config.eps) * ramp
        kappa_t = 1.0 - (1.0 - jnp.float32(config.ibp_kappa)) * ramp

        def total_loss(params):
            clean = spec_forward(
                params, spec,
                normalize_batch(x01.astype(jnp.float32), mean, std))
            if use_crown:
                from ..defenses.crown_ibp import margin_spec_bounds

                def bounds(p):
                    return margin_spec_bounds(p, spec, x01, y, eps_t,
                                              mean, std)

                crown, ibp = (jax.checkpoint(bounds)(params) if config.remat
                              else bounds(params))
                beta_t = 1.0 - (1.0 - jnp.float32(config.ibp_final_beta)) * ramp
                mixed = beta_t * crown + (1.0 - beta_t) * ibp  # [B, n]
                # CE on pseudo-logits -m (column y is exactly 0): the
                # margin formulation of Gowal's worst-case CE, shared by
                # both bounds (CE is shift-invariant per row)
                robust_logits = -mixed
                n = mixed.shape[-1]
                mask = jax.nn.one_hot(y, n, dtype=jnp.bool_)
                margin = jnp.min(jnp.where(mask, jnp.inf, mixed), axis=-1)
            else:
                def bounds(p):
                    return logit_bounds(p, spec, x01, eps_t, mean, std)

                lo, hi = (jax.checkpoint(bounds)(params) if config.remat
                          else bounds(params))
                robust_logits = worst_case_logits(lo, hi, y)
                margin = verified_margin(lo, hi, y)
            loss = (kappa_t * _ce_loss(clean, y, config.label_smoothing)
                    + (1.0 - kappa_t)
                    * _ce_loss(robust_logits, y, config.label_smoothing))
            return loss, (clean, margin)

        (loss, (clean, margin)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(state.params)
        metrics = {
            "loss": loss,
            # verified accuracy at the CURRENT ramp eps: converges to the
            # target-eps verified accuracy once the ramp completes
            "adv_accuracy": jnp.mean((margin > 0.0).astype(jnp.float32)),
            "clean_accuracy": jnp.mean(
                (jnp.argmax(clean, -1) == y).astype(jnp.float32)),
            "ibp_eps": eps_t,
            "ibp_kappa": kappa_t,
        }
        return grads, metrics

    grads_full = _with_augment(
        _with_grad_accum(grads_fn, int(config.grad_accum)), config)

    def step(state: TrainState, x01, y, key):
        return _finish_step(state, *grads_full(state, x01, y, key),
                            ema_decay=config.ema_decay)

    return step


def save_train_checkpoint(state: TrainState, path, epoch: int) -> None:
    """Full-state checkpoint (params + optimizer state + step counter) as
    msgpack — interrupted fine-tuning resumes EXACTLY, not just from the
    weights (the same checkpoint/resume policy as the sweep harnesses'
    per-cell JSON, applied to the training subsystem)."""
    from pathlib import Path

    from flax import serialization

    payload = {
        "params": state.params,
        "extra_variables": state.extra_variables,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": jnp.asarray(epoch, jnp.int32),
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(serialization.to_bytes(jax.device_get(payload)))
    tmp.replace(path)  # atomic: a crash never leaves a torn checkpoint


def load_train_checkpoint(state: TrainState, path) -> tuple[TrainState, int]:
    """Restore a checkpoint into a freshly-built TrainState template
    (tx/apply_fn come from the template; arrays from the file).  Returns
    ``(state, epoch)`` where ``epoch`` is the NEXT epoch to run."""
    from pathlib import Path

    from flax import serialization

    template = {
        "params": state.params,
        "extra_variables": state.extra_variables,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": jnp.zeros((), jnp.int32),
    }
    if state.ema_params is not None:
        # the template's EMA slot makes a checkpoint written without EMA
        # fail loudly rather than resume with a silently-reset shadow
        template["ema_params"] = state.ema_params
    payload = serialization.from_bytes(template, Path(path).read_bytes())
    restored = state.replace(
        params=payload["params"],
        extra_variables=payload["extra_variables"],
        opt_state=payload["opt_state"],
        step=jnp.asarray(payload["step"], jnp.int32),
    )
    if state.ema_params is not None:
        restored = restored.replace(ema_params=payload["ema_params"])
    return restored, int(payload["epoch"]) + 1


def deploy_params(state: TrainState):
    """The parameters to SHIP: the EMA shadow when maintained, else the
    raw trained parameters."""
    return state.params if state.ema_params is None else state.ema_params


def calibrate_batch_stats(state: TrainState, x01: jnp.ndarray,
                          mean=IMAGENET_MEAN, std=IMAGENET_STD,
                          batch_size: int = 256,
                          min_batches: int = 30) -> dict:
    """Precise-BN recalibration after ``train_bn`` training: run forward
    passes over ``x01`` (pixels in [0,1]) collecting the BatchNorm
    running-statistic EMA (momentum 0.9 per call, so ``min_batches``=30
    leaves <5% weight on the stale init stats — batches repeat if the
    data is short), and return the updated ``extra_variables``.  The
    result makes the exported checkpoint a standard inference-mode model.

    One compiled program, called per batch; the deployment parameters
    (EMA shadow when maintained) are the ones calibrated against.
    """
    if not state.train_bn:
        return state.extra_variables
    params = deploy_params(state)
    n = x01.shape[0]
    batch_size = max(1, min(int(batch_size), n))

    @jax.jit
    def one(extra, xb):
        variables = {"params": params, **extra}
        _, upd = state.apply_fn(variables, normalize_batch(xb, mean, std),
                                mutable=["batch_stats"])
        return {**extra, **upd}

    extra = state.extra_variables
    n_full = max(1, n // batch_size)
    total = max(int(min_batches), n_full)
    for i in range(total):
        start = (i % n_full) * batch_size
        extra = one(extra, x01[start:start + batch_size])
    return jax.device_get(extra)


def make_robust_eval_step(attack_steps: int, eps: float, alpha: float,
                          mean=IMAGENET_MEAN, std=IMAGENET_STD,
                          use_ema: bool = False):
    """(state, x01, y, key) -> {robust_accuracy}: PGD-``attack_steps``
    accuracy on the CURRENT (or EMA) parameters, one jitted program —
    the per-epoch robust validation line standard AT training reports
    (the reference consumes robust checkpoints but never measures one)."""

    def step(state: TrainState, x01, y, key):
        params = deploy_params(state) if use_ema else state.params

        def logits_fn(xx):
            out = _apply_model(state, params, normalize_batch(xx, mean, std))
            return out.astype(jnp.float32)

        x_adv = pgd_linf_attack(logits_fn, x01, y, eps=eps, alpha=alpha,
                                steps=int(attack_steps), key=key)
        pred = jnp.argmax(logits_fn(x_adv), -1)
        return {"robust_accuracy": jnp.mean(pred == y)}

    return step


def make_eval_step(mean=IMAGENET_MEAN, std=IMAGENET_STD,
                   use_ema: bool = False):
    """(state, x01, y) -> {clean_accuracy} (jit/pjit-able).  With
    ``use_ema`` the forward runs on the EMA shadow (falls back to the raw
    parameters when EMA is disabled)."""

    def step(state: TrainState, x01, y):
        params = deploy_params(state) if use_ema else state.params
        logits = _apply_model(state, params, normalize_batch(x01, mean, std))
        pred = jnp.argmax(logits.astype(jnp.float32), -1)
        return {"clean_accuracy": jnp.mean(pred == y)}

    return step
