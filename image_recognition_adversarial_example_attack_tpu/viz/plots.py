"""Matplotlib/seaborn plot families, mirroring the reference's outputs.

All functions take host numpy data (NHWC, [0,1]) and write PNGs; nothing
here touches the device.  Figure families match the reference:

- defense trend + 2x2 heatmap matrix   (defense_experiments.py:350-420)
- n x 4 attack-sample grid             (defense_experiments.py:423-530)
- transfer heatmap per attack          (transferability_attack.py:366-398)
- attack comparison grid (x10/x50 amplified perturbations),
  trajectory plot, perturbation histogram + FFT spectra
                                       (visualized_attacks.py:264-415)
- black-box clean/adv 2-panel          (blackbox_transfer.py:254-322)

The reference's spurious ``denormalize`` on already-[0,1] images
(visualized_attacks.py:207-212, a documented display bug — SURVEY.md §2
"Known defects") is intentionally NOT reproduced: images here are already
pixel-space and are displayed as-is.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Mapping, Sequence

import matplotlib

matplotlib.use("Agg")  # headless TPU hosts
import matplotlib.pyplot as plt
import numpy as np

warnings.filterwarnings("ignore", "Glyph.*missing from font", UserWarning)


def _ensure_dir(path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)


# ---------------------------------------------------------------------------
# Defense experiment plots
# ---------------------------------------------------------------------------

def plot_defense_heatmaps(
    results: Mapping[tuple[str, float], Mapping[str, int]],
    output_dir: Path,
    save_prefix: str = "defense_results",
) -> None:
    """Attack-trend line plot + 2x2 seaborn defense matrix.

    ``results``: {(attack_name, eps): stats dict with the six counters +
    'count'} — same structure the reference aggregates.
    """
    import pandas as pd
    import seaborn as sns

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for (attack_name, eps), stats in results.items():
        count = max(1, stats["count"])
        rows.append(
            {
                "Attack": attack_name.upper(),
                "Eps": float(eps),
                "Attack_Success": stats["attack_success"] / count,
                "Preproc_Defense_Acc": stats["defense_preproc_success"] / count,
                "Detector_Clean_Pass": 1.0 - stats["detector_flags_clean"] / count,
                "Detector_Adv_Flag": stats["detector_flags_adv"] / count,
                "Bypass_Detection": stats["detector_attack_success"] / count,
            }
        )
    df = pd.DataFrame(rows).sort_values(["Attack", "Eps"])

    # Figure 1: attack success vs eps
    plt.figure(figsize=(12, 6))
    for attack in df["Attack"].unique():
        subset = df[df["Attack"] == attack]
        plt.plot(subset["Eps"], subset["Attack_Success"], "o-",
                 label=attack, linewidth=2.5, markersize=8)
    plt.xlabel("Perturbation Budget (eps)", fontsize=12, fontweight="bold")
    plt.ylabel("Attack Success Rate", fontsize=12, fontweight="bold")
    plt.title("Attack Success Rate vs. Perturbation Strength",
              fontsize=14, fontweight="bold")
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_dir / f"{save_prefix}_attack_trend.png", dpi=300,
                bbox_inches="tight")
    plt.close()

    # Figure 2: 2x2 defense performance matrix
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    fig.suptitle("Defense Performance Matrix", fontsize=16, fontweight="bold")
    metrics = ["Preproc_Defense_Acc", "Detector_Adv_Flag", "Bypass_Detection"]
    titles = ["Preprocessing Defense\nAccuracy", "Detector Flag\nRate",
              "Bypass Detection\nSuccess Rate"]
    cmaps = ["RdYlGn", "YlOrRd", "YlOrRd"]
    for idx, (metric, title, cmap) in enumerate(zip(metrics, titles, cmaps)):
        ax = axes[idx // 2, idx % 2]
        pivot = df.pivot(index="Eps", columns="Attack", values=metric)
        sns.heatmap(pivot, annot=True, fmt=".3f", cmap=cmap, ax=ax,
                    cbar_kws={"label": "Rate"}, linewidths=0.5)
        ax.set_title(title, fontweight="bold")
        ax.set_xlabel("Attack Method")
        ax.set_ylabel("Perturbation (eps)")
    axes[1, 1].axis("off")
    plt.tight_layout()
    plt.savefig(output_dir / f"{save_prefix}_defense_matrix.png", dpi=300,
                bbox_inches="tight")
    plt.close()


def plot_attack_samples(
    samples: Sequence[Mapping],
    output_dir: Path,
    eps: float,
) -> Path:
    """n x 4 grid: clean / adversarial / defended / |perturbation| heat map.

    Each sample dict: x (HWC), x_adv, x_def, pred_clean, conf_clean,
    pred_adv, pred_def.
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    n = len(samples)
    if n == 0:
        raise ValueError("no samples to plot")
    fig, axes = plt.subplots(n, 4, figsize=(12, 3 * n))
    if n == 1:
        axes = axes.reshape(1, -1)
    fig.suptitle(f"Attack & Defense Samples (ε={eps:.3f})",
                 fontsize=16, fontweight="bold")

    for idx, s in enumerate(samples):
        perturb = np.abs(s["x_adv"] - s["x"]).sum(axis=-1)
        images = [s["x"], s["x_adv"], s["x_def"]]
        titles = [
            f"Clean\nPred: {s['pred_clean']}\nConf: {s['conf_clean']:.3f}",
            f"Adversarial\nPred: {s['pred_adv']}",
            f"Defended\nPred: {s['pred_def']}",
            "Perturbation\nMagnitude",
        ]
        for col in range(4):
            ax = axes[idx, col]
            if col < 3:
                ax.imshow(np.clip(images[col], 0, 1))
            else:
                im = ax.imshow(perturb, cmap="hot")
                plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
            ax.set_title(titles[col], fontsize=10)
            ax.axis("off")

    plt.tight_layout()
    out = output_dir / "attack_samples.png"
    plt.savefig(out, dpi=300, bbox_inches="tight")
    plt.close()
    return out


# ---------------------------------------------------------------------------
# Transfer plots
# ---------------------------------------------------------------------------

def plot_transfer_heatmap(
    matrix: np.ndarray,
    eps_values: Sequence[float],
    model_names: Sequence[str],
    source_model: str,
    attack_name: str,
    out_path: Path,
) -> None:
    """eps x target-model ASR heatmap (transferability_attack.py:366-398)."""
    import seaborn as sns

    _ensure_dir(Path(out_path))
    plt.figure(figsize=(10, 6))
    sns.heatmap(matrix, annot=True, fmt=".3f", cmap="YlOrRd",
                xticklabels=list(model_names),
                yticklabels=[f"{e:.3f}" for e in eps_values])
    plt.title(
        "Transferability Attack Success Rates\n"
        f"Source: {source_model}, Attack: {attack_name.upper()}"
    )
    plt.xlabel("Target Models (Black-box)")
    plt.ylabel("Perturbation Budget (eps)")
    plt.tight_layout()
    plt.savefig(out_path, dpi=300)
    plt.close()


def plot_blackbox_pair(
    img_clean: np.ndarray,
    img_adv: np.ndarray,
    clean_text: str,
    adv_text: str,
    title: str,
    attack_name: str,
    out_path: Path,
) -> None:
    """Side-by-side clean/adv panel with per-model labels underneath."""
    _ensure_dir(Path(out_path))
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    axes[0].imshow(np.clip(img_clean, 0, 1))
    axes[0].set_title("Clean")
    axes[0].axis("off")
    axes[1].imshow(np.clip(img_adv, 0, 1))
    axes[1].set_title(f"Adv ({attack_name})")
    axes[1].axis("off")
    fig.suptitle(title)
    axes[0].text(0.5, -0.1, clean_text, transform=axes[0].transAxes,
                 ha="center", va="top", fontsize=8)
    axes[1].text(0.5, -0.1, adv_text, transform=axes[1].transAxes,
                 ha="center", va="top", fontsize=8)
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close(fig)


# ---------------------------------------------------------------------------
# Deep-dive visualizations (visualized_attacks family)
# ---------------------------------------------------------------------------

def plot_attack_grid(
    x_clean: np.ndarray,
    results: Mapping[str, Mapping],
    save_path: Path,
) -> None:
    """Per attack: original-vs-adversarial pair, x10 and x50 amplified
    perturbation panels (visualized_attacks.py:264-305)."""
    _ensure_dir(Path(save_path))
    n_attacks = len(results)
    fig = plt.figure(figsize=(4 * 3, 4 * n_attacks))

    for idx, (attack_name, result) in enumerate(results.items()):
        x_adv = np.asarray(result["x_adv"])
        diff = x_adv - x_clean
        success = "SUCCESS" if result["pred_clean"][0] != result["pred_adv"][0] else "FAILED"

        ax1 = plt.subplot(n_attacks, 3, idx * 3 + 1)
        pair = np.concatenate([np.clip(x_clean, 0, 1), np.clip(x_adv, 0, 1)], axis=1)
        ax1.imshow(pair)
        ax1.set_title("Original vs Adversarial", fontsize=11)
        ax1.axvline(x=x_clean.shape[1], color="white", linewidth=2)
        ax1.axis("off")

        for col, amp in ((2, 10), (3, 50)):
            ax = plt.subplot(n_attacks, 3, idx * 3 + col)
            ax.imshow(np.clip(x_clean + amp * diff, 0, 1))
            ax.set_title(f"Perturbation ×{amp}", fontsize=11)
            ax.axis("off")

        # banner at the top edge of THIS attack's row (rows span
        # [1-(idx+1)/n, 1-idx/n] of figure height)
        fig.text(0.5, 1 - idx / n_attacks - 0.005,
                 f"{attack_name.upper()} Attack - {success}",
                 ha="center", va="top", fontsize=14, fontweight="bold")

    plt.tight_layout(rect=[0, 0, 1, 0.98])
    plt.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close()


def plot_attack_trajectory(
    traj_probs: np.ndarray,
    traj_l2: np.ndarray,
    attack_name: str,
    eps: float,
    save_path: Path,
) -> None:
    """Probability trajectory + L2 growth (visualized_attacks.py:323-382)."""
    _ensure_dir(Path(save_path))
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))

    ax1.plot(traj_probs[:, 0], label="Original Class", color="green",
             linewidth=2, marker="o", markersize=3)
    ax1.plot(traj_probs[:, 1], label="Target Class", color="red",
             linewidth=2, marker="x", markersize=3)
    ax1.axhline(y=0.5, color="gray", linestyle="--", alpha=0.5,
                label="Decision Boundary")
    ax1.set_xlabel("Attack Step", fontsize=12)
    ax1.set_ylabel("Prediction Probability", fontsize=12)
    ax1.set_title(f"{attack_name.upper()} Attack Trajectory (Eps={eps:.5f})",
                  fontsize=14)
    ax1.legend(loc="upper right")
    ax1.grid(True, alpha=0.3)
    ax1.set_ylim(-0.05, 1.05)

    ax2.plot(traj_l2, color="purple", linewidth=2, marker="s", markersize=3)
    ax2.set_xlabel("Attack Step", fontsize=12)
    ax2.set_ylabel("L2 Perturbation", fontsize=12)
    ax2.set_title("Perturbation Growth", fontsize=14)
    ax2.grid(True, alpha=0.3)

    plt.tight_layout()
    plt.savefig(save_path, dpi=300)
    plt.close()


def plot_perturbation_analysis(
    x_clean: np.ndarray,
    results: Mapping[str, Mapping],
    save_path: Path,
) -> None:
    """Histogram row + log-FFT-magnitude row per attack
    (visualized_attacks.py:384-415)."""
    _ensure_dir(Path(save_path))
    n = max(1, len(results))
    fig, axes = plt.subplots(2, n, figsize=(5 * n, 10), squeeze=False)
    fig.suptitle("Perturbation Spatial & Frequency Analysis",
                 fontsize=16, fontweight="bold")
    colors = ["red", "blue", "purple", "orange", "teal"]

    for idx, (attack_name, result) in enumerate(results.items()):
        diff = np.asarray(result["x_adv"]) - x_clean
        axes[0, idx].hist(diff.flatten(), bins=50, alpha=0.7,
                          color=colors[idx % len(colors)], range=(-0.1, 0.1))
        axes[0, idx].set_title(f"{attack_name.upper()} Distribution", fontsize=12)
        axes[0, idx].set_xlabel("Perturbation Value")
        axes[0, idx].set_ylabel("Frequency")
        axes[0, idx].grid(True, alpha=0.3)

        fft_diff = np.fft.fft2(diff.mean(axis=2))  # channel-mean 2-D spectrum
        fft_mag = np.abs(np.fft.fftshift(fft_diff))
        im = axes[1, idx].imshow(np.log1p(fft_mag), cmap="hot")
        axes[1, idx].set_title(f"{attack_name.upper()} Frequency", fontsize=12)
        axes[1, idx].axis("off")
        plt.colorbar(im, ax=axes[1, idx], fraction=0.046, pad=0.04)

    plt.tight_layout()
    plt.savefig(save_path, dpi=300)
    plt.close()
