"""Shared CLI plumbing: model/dtype/seed flags, batched prediction helpers.

Every CLI mirrors its reference script's argparse surface (SURVEY.md §1 L5)
and adds the TPU-native flags: ``--model-dtype`` (bfloat16 by default on
TPU), ``--weights`` (torch .pth or msgpack), ``--seed`` (the reference's
randomness is unseeded), ``--profile-dir`` (jax profiler traces).
"""

from __future__ import annotations

import argparse
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import enable_compilation_cache

# Every CLI flows through this module; arm the persistent compile cache once.
enable_compilation_cache()

# $ADV_TPU_PLATFORM=cpu forces the CPU backend (useful for smoke tests and
# air-gapped development; plain $JAX_PLATFORMS is overridden by the TPU
# plugin's site customization on some hosts).  MUST run before distributed
# init, which touches the backend.
import os as _os  # noqa: E402

_platform = _os.environ.get("ADV_TPU_PLATFORM")
if _platform:
    try:
        jax.config.update("jax_platforms", _platform)
    except Exception as _e:  # pragma: no cover — config is set post-backend
        import warnings as _warnings

        _warnings.warn(f"ADV_TPU_PLATFORM={_platform} could not be applied: {_e}")

# Join a multi-host pod when the launcher provides coordinates.
from ..parallel.distributed import maybe_initialize_distributed  # noqa: E402

maybe_initialize_distributed()


def add_model_args(parser: argparse.ArgumentParser, default_model: str = "resnet50") -> None:
    parser.add_argument("--model", type=str, default=default_model,
                        help="model name from the zoo (default: %(default)s)")
    parser.add_argument("--weights", type=str, default=None,
                        help="weights file (.msgpack cache or torchvision .pth)")
    parser.add_argument("--model-dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="compute dtype (default: bfloat16 on TPU, float32 on CPU)")
    parser.add_argument("--int8", action="store_true",
                        help="quantized inference on the int8 MXU (every zoo "
                             "family; ~parity throughput on the "
                             "bandwidth-bound ImageNet families — a "
                             "robustness-evaluation mode, not a speed "
                             "lever; benchmarks/ROOFLINE.md, ops/int8.py)")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax profiler trace here")


def add_extended_attack_args(parser: argparse.ArgumentParser) -> None:
    """Flags for the beyond-reference attack families every CLI dispatches to
    (deepfool / nes / spsa / hsja / ead); defaults match AttackParams."""
    parser.add_argument("--deepfool_steps", type=int, default=50,
                        help="deepfool max iterations")
    parser.add_argument("--deepfool_classes", type=int, default=10,
                        help="deepfool candidate classes (top-k by clean logits)")
    parser.add_argument("--deepfool_overshoot", type=float, default=0.02,
                        help="deepfool boundary overshoot factor")
    parser.add_argument("--est_samples", type=int, default=32,
                        help="nes/spsa antithetic probe pairs per step")
    parser.add_argument("--nes_sigma", type=float, default=1e-3,
                        help="nes Gaussian smoothing radius")
    parser.add_argument("--spsa_delta", type=float, default=1e-2,
                        help="spsa finite-difference perturbation size")
    parser.add_argument("--bandits_steps", type=int, default=500,
                        help="bandits-TD iterations (2 queries each)")
    parser.add_argument("--bandits_prior_factor", type=int, default=8,
                        help="bandits data-prior downsampling factor "
                             "(latent lattice H/f x W/f)")
    parser.add_argument("--bandits_fd_eta", type=float, default=0.1,
                        help="bandits image-space exploration radius")
    parser.add_argument("--bandits_delta", type=float, default=0.1,
                        help="bandits latent exploration radius")
    parser.add_argument("--bandits_prior_lr", type=float, default=1.0,
                        help="bandits exponentiated-gradients rate")
    parser.add_argument("--hsja_steps", type=int, default=10,
                        help="hsja outer boundary-walk iterations")
    parser.add_argument("--hsja_probes", type=int, default=32,
                        help="hsja decision queries per normal estimate")
    parser.add_argument("--ead_beta", type=float, default=1e-3,
                        help="ead elastic-net L1 weight")
    parser.add_argument("--ead_c", type=float, default=50.0,
                        help="ead margin-loss weight (FISTA needs larger "
                             "c than CW's Adam — see attacks/ead.py)")
    parser.add_argument("--ead_lr", type=float, default=0.05,
                        help="ead FISTA step size")
    parser.add_argument("--stadv_steps", type=int, default=200,
                        help="stadv Adam iterations on the flow field")
    parser.add_argument("--stadv_lr", type=float, default=0.01,
                        help="stadv Adam learning rate")
    parser.add_argument("--stadv_tau", type=float, default=0.05,
                        help="stadv flow-smoothness weight (non-Lp: this, "
                             "not eps, bounds the distortion)")
    parser.add_argument("--boundary_steps", type=int, default=500,
                        help="boundary-walk iterations (2 hard-label "
                             "queries each)")
    parser.add_argument("--boundary_spherical_step", type=float, default=0.01,
                        help="boundary initial along-boundary step "
                             "(self-adapts per sample)")
    parser.add_argument("--boundary_source_step", type=float, default=0.01,
                        help="boundary initial contraction step "
                             "(self-adapts per sample)")
    parser.add_argument("--simba_steps", type=int, default=1000,
                        help="simba coordinate trials (<=2 queries each)")
    parser.add_argument("--simba_eps", type=float, default=0.2,
                        help="simba per-direction step size (paper 0.2)")
    parser.add_argument("--simba_mode", choices=["dct", "pixel"],
                        default="dct",
                        help="simba basis: low-frequency DCT (paper "
                             "default) or single pixels")
    parser.add_argument("--jsma_steps", type=int, default=100,
                        help="jsma L0 budget: max features changed "
                             "(greedy, one per step)")
    parser.add_argument("--jsma_theta", type=float, default=1.0,
                        help="jsma per-feature move (1.0 saturates to "
                             "the [0,1] bound)")
    parser.add_argument("--l1_sparsity", type=float, default=0.01,
                        help="pgd_l1 (SLIDE) top-|grad| coordinate "
                             "fraction per step")
    parser.add_argument("--spatial_max_rot", type=float, default=30.0,
                        help="spatial rotation budget in degrees "
                             "(non-Lp: this + --spatial_max_trans, not "
                             "eps, define the threat model)")
    parser.add_argument("--spatial_max_trans", type=float, default=0.1,
                        help="spatial translation budget as a fraction "
                             "of each image axis")
    parser.add_argument("--spatial_candidates", type=int, default=10,
                        help="spatial worst-of-k random draws (0 disables "
                             "the random part)")
    parser.add_argument("--spatial_grid_rot", type=int, default=0,
                        help="spatial exhaustive-grid rotation steps "
                             "(grid used when this AND --spatial_grid_trans "
                             "are > 0; paper's strongest: 31)")
    parser.add_argument("--spatial_grid_trans", type=int, default=0,
                        help="spatial exhaustive-grid translation steps "
                             "per axis (paper's strongest: 5)")


def extended_attack_kwargs(args: argparse.Namespace) -> dict:
    """kwargs for AttackParams/DefenseEvalConfig from the extended flags."""
    return {
        "deepfool_steps": int(args.deepfool_steps),
        "deepfool_classes": int(args.deepfool_classes),
        "deepfool_overshoot": float(args.deepfool_overshoot),
        "est_samples": int(args.est_samples),
        "nes_sigma": float(args.nes_sigma),
        "spsa_delta": float(args.spsa_delta),
        "bandits_steps": int(args.bandits_steps),
        "bandits_prior_factor": int(args.bandits_prior_factor),
        "bandits_fd_eta": float(args.bandits_fd_eta),
        "bandits_delta": float(args.bandits_delta),
        "bandits_prior_lr": float(args.bandits_prior_lr),
        "hsja_steps": int(args.hsja_steps),
        "hsja_probes": int(args.hsja_probes),
        "ead_beta": float(args.ead_beta),
        "ead_c": float(args.ead_c),
        "ead_lr": float(args.ead_lr),
        "stadv_steps": int(args.stadv_steps),
        "stadv_lr": float(args.stadv_lr),
        "stadv_tau": float(args.stadv_tau),
        "boundary_steps": int(args.boundary_steps),
        "boundary_spherical_step": float(args.boundary_spherical_step),
        "boundary_source_step": float(args.boundary_source_step),
        "simba_steps": int(args.simba_steps),
        "simba_eps": float(args.simba_eps),
        "simba_mode": str(args.simba_mode),
        "jsma_steps": int(args.jsma_steps),
        "jsma_theta": float(args.jsma_theta),
        "l1_sparsity": float(args.l1_sparsity),
        "spatial_max_rot": float(args.spatial_max_rot),
        "spatial_max_trans": float(args.spatial_max_trans),
        "spatial_candidates": int(args.spatial_candidates),
        "spatial_grid_rot": int(args.spatial_grid_rot),
        "spatial_grid_trans": int(args.spatial_grid_trans),
    }


def resolve_dtype(name: str | None) -> Any:
    if name == "float32":
        return jnp.float32
    if name == "bfloat16":
        return jnp.bfloat16
    # default: bf16 on accelerators (MXU), f32 on CPU
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def load_bundle(args: argparse.Namespace, name: str | None = None):
    """Load a zoo model honoring the CLI's dtype/weights flags.

    An explicit ``--weights`` path applies ONLY when loading the model the
    flag was written for (``args.model`` / the default) — in multi-model
    CLIs, force-converting e.g. a resnet50 checkpoint into a vgg19 template
    would abort the sweep.  Other models resolve via the weights directory.
    """
    from ..models.zoo import load_model

    dtype = resolve_dtype(getattr(args, "model_dtype", None))
    target = name or args.model
    explicit = getattr(args, "weights", None)
    if name is not None and name != getattr(args, "model", None):
        explicit = None
    bundle = load_model(target, dtype=dtype, weights=explicit,
                        int8=bool(getattr(args, "int8", False)))
    # jit closures over HOST-numpy variables serialize every weight into
    # the axon remote-compile payload; vgg19 (~0.55 GB f32) exceeds the
    # endpoint's ~0.5 GB body limit (HTTP 413 — hit by the r5 reference
    # replay's blackbox stage).  device_put turns them into runtime
    # buffers so the compile request carries HLO only — same fix bench.py
    # carries; one upload per process, no-op on CPU.
    bundle.variables = jax.device_put(bundle.variables)
    return bundle


def model_input_size(args: argparse.Namespace) -> int:
    """The --model's native input size (224 ImageNet / 32 CIFAR family)
    WITHOUT building the model — for CLIs that decode images before the
    bundle exists."""
    from ..models.zoo import model_meta

    return int(model_meta(getattr(args, "model", "resnet50"))["input_size"])


def bundle_input_dtype(bundle):
    """The input-cast dtype for a bundle's closures (the ONE place the
    bf16-input-cast policy lives — gradcam/feature/logits closures must
    all agree or their forwards diverge)."""
    return bundle.module.dtype if bundle.module.dtype != jnp.float32 else None


def make_fns(bundle):
    """(logits_fn, features_fn) for a bundle, with bf16 input cast when the
    module computes in bf16."""
    from ..attacks.api import make_logits_fn
    from ..defenses.detector import make_features_fn

    input_dtype = bundle_input_dtype(bundle)
    lf = make_logits_fn(bundle.module, bundle.variables, bundle.mean, bundle.std,
                        input_dtype=input_dtype)
    ff = make_features_fn(bundle.module, bundle.variables, bundle.mean, bundle.std,
                          input_dtype=input_dtype)
    return lf, ff


def make_fns_explicit(bundle):
    """Variables-EXPLICIT twin of make_fns: returns
    ``(logits_of(variables, x01), features_of(variables, x01))``.

    Required whenever a jit program over a relay-attached TPU captures
    large-model weights: the axon remote-compile endpoint serializes
    closure-captured weights into the compile payload EVEN when
    device-resident (~0.5 GB body limit -> HTTP 413 on vgg19-size
    models; hit by the r5 reference replay's blackbox/transferability
    stages).  Variables passed as explicit jit ARGUMENTS cross as
    runtime buffers instead — the same fix bench.py carries.
    """
    from ..attacks.api import make_logits_fn
    from ..defenses.detector import make_features_fn

    input_dtype = bundle_input_dtype(bundle)
    module, mean, std = bundle.module, bundle.mean, bundle.std

    def logits_of(variables, x01):
        return make_logits_fn(module, variables, mean, std,
                              input_dtype=input_dtype)(x01)

    def features_of(variables, x01):
        return make_features_fn(module, variables, mean, std,
                                input_dtype=input_dtype)(x01)

    return logits_of, features_of


class VarBoundJit:
    """``jax.jit(fn)`` with the model-variables pytree as an explicit
    leading argument, bound at construction so call sites keep plain
    ``f(x, ...)`` ergonomics.  ``fn`` must take ``(variables, *args)``.
    The SAME device-resident pytree is passed on every call (no
    re-upload over the relay), while the compile request stays HLO-only
    (rationale: make_fns_explicit)."""

    def __init__(self, fn, variables):
        self._jit = jax.jit(fn)
        self._variables = variables

    def __call__(self, *args):
        return self._jit(self._variables, *args)


def topk_host(probs: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """[B,K] probs -> (values [B,k], indices [B,k]) sorted descending."""
    idx = np.argsort(-probs, axis=-1)[:, :k]
    vals = np.take_along_axis(probs, idx, axis=-1)
    return vals, idx


def print_topk(title: str, prob_row: np.ndarray, idx_row: np.ndarray, labels) -> None:
    """The reference's exact per-rank print format (ResNet.py:76-78)."""
    print(f"{title}:")
    for rank, (p, idx) in enumerate(zip(prob_row, idx_row), start=1):
        label = labels[idx] if labels and idx < len(labels) else str(idx)
        print(f"Top {rank}: {label} (class {idx}), prob = {p:.4f}")


def resolve_image_inputs(image_dir: str | None, image: str,
                         skip_bmp: bool = True) -> list:
    """The reference's shared --image_dir / --image resolution
    (defense_experiments.py:749-762, transferability_attack.py:222-234):
    directory -> sorted image list, else single file; fail fast on missing
    inputs before any device work."""
    from pathlib import Path

    from ..core.images import list_images

    if image_dir is not None:
        d = Path(image_dir)
        if not d.is_dir():
            raise SystemExit(f"image_dir not found: {d}")
        paths = [p for p in list_images(d)
                 if not (skip_bmp and p.suffix.lower() == ".bmp")]
        if not paths:
            raise SystemExit(f"no images found in {d}")
        return paths
    p = Path(image)
    if not p.is_file():
        raise SystemExit(f"image not found: {p}")
    return [p]


# Sentinel for "unlabeled — substitute the model's pseudo-label at use
# time".  The single holder of the convention shared by every streaming
# harness (eval/streaming.py) and label-resolving CLI.
UNLABELED = -1


def check_label_range(labels, n_classes: int, *, source: str = "labels_json"):
    """Out-of-range class ids silently corrupt every counter (one_hot of
    an invalid id is all-zeros, ``pred != id`` always holds) — fail loud
    instead.  The UNLABELED sentinel is always legal."""
    arr = np.asarray(labels)
    bad = arr[(arr >= int(n_classes)) | (arr < UNLABELED)]
    if bad.size:
        ids = sorted(set(int(v) for v in bad))[:5]
        raise SystemExit(
            f"{source} contains out-of-range class ids {ids} for a "
            f"{int(n_classes)}-class model")


def positive_int(value: str) -> int:
    """argparse type: a strictly positive integer (rejects 0 and negatives
    at parse time, where the error names the flag, instead of silently
    clamping deep in the run)."""
    n = int(value)
    if n < 1:
        raise argparse.ArgumentTypeError(
            f"expected a positive integer, got {value}")
    return n


def n_classes_of(logits_fn, input_size: int) -> int:
    """Class count via abstract evaluation — no device work."""
    shape = jax.eval_shape(
        logits_fn, jax.ShapeDtypeStruct((1, input_size, input_size, 3),
                                        jnp.float32))
    return int(shape.shape[-1])


# CLI arg names each attack's compiled program actually reads, mirrored
# from the run_attack dispatch (attacks/api.py:run_attack).  Used to scope
# the resume fingerprint per grid cell: changing --cw_steps must not
# invalidate an fgsm cell, and dropping 'pgd' from --attacks must not
# invalidate the fgsm cells computed alongside it.
ATTACK_KNOB_ARGS: dict[str, frozenset] = {
    "fgsm": frozenset(),
    "pgd": frozenset({"steps", "alpha"}),
    "pgd_l2": frozenset({"steps", "alpha"}),
    "mifgsm": frozenset({"steps", "alpha", "mu"}),
    "dim": frozenset({"steps", "alpha", "mu"}),
    "tim": frozenset({"steps", "alpha", "mu"}),
    "apgd": frozenset({"steps"}),
    "apgd_dlr": frozenset({"steps"}),
    "apgd_t": frozenset({"steps", "n_target_classes"}),
    "fab": frozenset({"steps", "n_target_classes"}),
    "square": frozenset({"square_steps"}),
    "square_l2": frozenset({"square_steps"}),
    "deepfool": frozenset(
        {"deepfool_steps", "deepfool_classes", "deepfool_overshoot"}),
    "nes": frozenset({"steps", "alpha", "est_samples", "nes_sigma"}),
    "spsa": frozenset({"steps", "alpha", "est_samples", "spsa_delta"}),
    "bandits": frozenset({"alpha", "bandits_steps", "bandits_prior_factor",
                          "bandits_fd_eta", "bandits_delta",
                          "bandits_prior_lr"}),
    "hsja": frozenset({"hsja_steps", "hsja_probes"}),
    "ead": frozenset({"cw_steps", "cw_kappa", "ead_beta", "ead_c", "ead_lr"}),
    "cw": frozenset({"cw_c", "cw_kappa", "cw_steps", "cw_lr"}),
    "stadv": frozenset({"stadv_steps", "stadv_lr", "stadv_tau", "cw_kappa"}),
    "boundary": frozenset({"boundary_steps", "boundary_spherical_step",
                           "boundary_source_step"}),
    "simba": frozenset({"simba_steps", "simba_eps", "simba_mode"}),
    "jsma": frozenset({"jsma_steps", "jsma_theta"}),
    "pgd_l1": frozenset({"steps", "alpha", "l1_sparsity"}),
    "spatial": frozenset({"spatial_max_rot", "spatial_max_trans",
                          "spatial_candidates", "spatial_grid_rot",
                          "spatial_grid_trans"}),
}
_ALL_KNOB_ARGS: frozenset = frozenset().union(*ATTACK_KNOB_ARGS.values())

# Attacks whose program never reads eps (minimal-norm or non-Lp or
# self-budgeted searches): their grid cells are identical across the eps
# sweep, so the CLIs compute one cell and reuse it.  Their per-cell PRNG
# must therefore come from an EPS-FREE cell id (cell_key below) — keying
# the randomness of e.g. boundary/simba on the first eps of the sweep
# would make a resumed/cached cell disagree with a fresh run of a
# different eps subset.
EPS_INDEPENDENT_ATTACKS = ("cw", "deepfool", "ead", "stadv", "boundary",
                           "simba", "jsma", "spatial")


def cell_rng_id(attack_name: str, eps: float) -> str:
    """The cell id the PRNG is folded from: eps-free for eps-independent
    attacks (their one computed cell serves every eps)."""
    if attack_name in EPS_INDEPENDENT_ATTACKS:
        return f"{attack_name}:epsfree"
    return f"{attack_name}:{float(eps):.6f}"


def cell_key(key0, cell_id: str):
    """Per-cell PRNG key that depends only on (seed key, cell id) — never on
    which other grid cells ran first.

    A sequential ``jax.random.split`` walk would make a cell's randomness a
    function of its position in the ``attacks x eps`` grid, so a cell resumed
    under the scoped fingerprint (``config_fingerprint(attack_name=...)``,
    which deliberately ignores the grid composition) could disagree with a
    fresh run of the narrower grid.  Folding a stable hash of the cell id
    into the seed key makes resumed and fresh cells bitwise-identical."""
    import hashlib

    h = int.from_bytes(hashlib.sha256(cell_id.encode()).digest()[:4],
                       "big") & 0x7FFFFFFF
    return jax.random.fold_in(key0, h)


def labels_digest(labels_json: str | None) -> str | None:
    """Content hash of the labels file, or None.  Compute once and pass to
    ``config_fingerprint`` when fingerprinting many cells of one run."""
    import hashlib
    from pathlib import Path as _Path

    if not labels_json:
        return None
    return hashlib.sha256(_Path(labels_json).read_bytes()).hexdigest()


def config_fingerprint(args, exclude=("output_dir", "resume", "viz_samples",
                                      "profile_dir", "certified"),
                       attack_name: str | None = None,
                       labels_content: str | None = None) -> str:
    """Short hash of every result-semantics-defining CLI argument plus the
    CONTENT of the labels file (a same-named file with edited labels must
    not resume stale cells).  Used to gate --resume: a cell computed under
    a different configuration recomputes instead of silently mixing
    semantics in one summary.

    With ``attack_name`` the hash is scoped to ONE grid cell: the attack
    grid (``attacks``/``eps_list`` — already encoded in the cell id) and
    every attack knob the named attack's program never reads are dropped,
    so e.g. rerunning with a different --cw_steps resumes the untouched
    fgsm cells.  Unknown attack names keep every knob (safe default)."""
    import hashlib
    import json as _json
    from pathlib import Path as _Path

    exclude = set(exclude)
    if attack_name is not None:
        exclude |= {"attacks", "eps_list"}
        exclude |= _ALL_KNOB_ARGS - ATTACK_KNOB_ARGS.get(
            attack_name, _ALL_KNOB_ARGS)
    payload = {k: v for k, v in sorted(vars(args).items())
               if k not in exclude}
    if getattr(args, "labels_json", None):
        payload["__labels_content__"] = (
            labels_content if labels_content is not None
            else hashlib.sha256(
                _Path(args.labels_json).read_bytes()).hexdigest())
        payload.pop("labels_json", None)
    blob = _json.dumps(payload, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def imagenet_val_inputs(val_dir: str) -> tuple[list, str]:
    """ImageNet-val ground-truth data plane: ``(paths, labels_json_path)``.

    Scans the standard on-disk layouts (class subfolders or flat +
    val_map.txt — core/datasets.py::list_imagenet_val) and materializes
    the ground truth as a content-addressed labels JSON in the tmp dir,
    so EVERY downstream consumer — resolve_labels, the streaming
    UNLABELED sentinel, --resume config digests (which hash labels-file
    CONTENT, so the digest is stable across runs and hosts) — runs the
    one existing labels code path with guaranteed full coverage.  This is
    `/root/reference/test.py:48-60`'s labels-from-files semantics at
    dataset scale: ground truth becomes one flag instead of a hand-built
    labels_json.
    """
    import hashlib
    import json as _json
    import tempfile
    from pathlib import Path as _Path

    from ..core.datasets import list_imagenet_val

    paths, labels, classes = list_imagenet_val(val_dir)
    table = {str(p): int(l) for p, l in zip(paths, labels)}
    blob = _json.dumps(table, sort_keys=True)
    digest = hashlib.sha256(blob.encode()).hexdigest()[:16]
    out = _Path(tempfile.gettempdir()) / f"imagenet_val_labels_{digest}.json"
    # atomic + content-verified: concurrent CLIs on the same val dir must
    # never read a half-written file, and a pre-existing file is trusted
    # only if its bytes hash to the name's digest
    if (not out.is_file()
            or hashlib.sha256(out.read_bytes()).hexdigest()[:16] != digest):
        fd, tmp = tempfile.mkstemp(dir=out.parent, suffix=".json")
        try:
            _os.write(fd, blob.encode())
            _os.close(fd)
            _os.replace(tmp, out)
        except BaseException:
            _Path(tmp).unlink(missing_ok=True)
            raise
    # classes is non-None for subfolders AND named (WNID) annotations
    layout = (f"{len(classes)} named classes" if classes
              else "flat + val_map")
    print(f"ImageNet-val ground truth: {len(paths)} images ({layout}, "
          f"{len(set(table.values()))} distinct labels) -> {out}")
    return paths, str(out)


def add_imagenet_val_arg(parser) -> None:
    parser.add_argument(
        "--imagenet_val_dir", type=str, default=None,
        help="ImageNet validation directory with GROUND-TRUTH labels: "
             "either torchvision-style class subfolders (sorted folder "
             "names -> class indices, matching converted checkpoints "
             "when folders are WNIDs) or flat images + val_map.txt "
             "'<filename> <class_index>' lines; replaces --image_dir "
             "and implies the labels (mutually exclusive with "
             "--labels_json)")


def apply_imagenet_val(args) -> list | None:
    """Shared --imagenet_val_dir resolution: returns the path list and
    sets ``args.labels_json`` to the materialized ground truth, or None
    when the flag is absent.  Fails fast on conflicting data planes."""
    if not getattr(args, "imagenet_val_dir", None):
        return None
    if getattr(args, "labels_json", None):
        raise SystemExit("--imagenet_val_dir carries its own ground-truth "
                         "labels; drop --labels_json")
    if getattr(args, "cifar10_dir", None):
        raise SystemExit("pass at most one of --imagenet_val_dir / "
                         "--cifar10_dir")
    if getattr(args, "image_dir", None):
        raise SystemExit("--imagenet_val_dir replaces --image_dir; "
                         "pass only one")
    paths, labels_json = imagenet_val_inputs(args.imagenet_val_dir)
    args.labels_json = labels_json
    return paths


def resolve_eval_inputs(args, *, skip_bmp: bool = True) -> list:
    """The one shared input plane for the eval CLIs: --imagenet_val_dir
    (ground truth materialized into ``args.labels_json``) wins, else
    --image_dir / --image.  Conflicting data-plane flags fail fast inside
    apply_imagenet_val."""
    val_paths = apply_imagenet_val(args)
    if val_paths is not None:
        return val_paths
    return resolve_image_inputs(args.image_dir, args.image,
                                skip_bmp=skip_bmp)


def resolve_labels_sentinel(labels_json: str | None, paths):
    """Ground-truth label vector with ``UNLABELED`` (-1) where the file has
    no entry, for streaming paths that substitute pseudo-labels per chunk.
    Returns None when no label file is given (pure pseudo-label mode)."""
    if not labels_json:
        return None
    return np.asarray(resolve_labels(
        labels_json, paths, np.full(len(paths), UNLABELED, np.int64)))


def resolve_labels(labels_json: str | None, paths, pseudo) -> "np.ndarray":
    """Evaluation labels: ground truth from a JSON mapping when given,
    else the model's clean predictions (the air-gapped pseudo-label
    convention every harness uses).

    The JSON maps image path OR basename -> integer class id.  Entries are
    matched per path (basename fallback); missing entries fall back to
    that image's pseudo-label with a warning, so a partial label file
    still evaluates.
    """
    import json as _json
    from pathlib import Path as _Path

    pseudo = np.asarray(pseudo)
    if not labels_json:
        return pseudo
    table = _json.loads(_Path(labels_json).read_text())
    out = pseudo.copy()
    missing = []
    for i, p in enumerate(paths):
        key = str(p)
        base = _Path(p).name
        if key in table:
            out[i] = int(table[key])
        elif base in table:
            out[i] = int(table[base])
        else:
            missing.append(base)
    if missing:
        print(f"WARNING: no label for {len(missing)} image(s) "
              f"({missing[:3]}{'...' if len(missing) > 3 else ''}); "
              "using pseudo-labels for those")
    return out


def maybe_profile(profile_dir: str | None):
    """Context manager: jax.profiler.trace when a dir is given, else no-op."""
    import contextlib

    if profile_dir:
        return jax.profiler.trace(profile_dir)
    return contextlib.nullcontext()
