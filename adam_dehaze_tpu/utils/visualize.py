"""Matplotlib visualisation utilities (reference: utils/visualize.py).

All functions take NHWC float [0,1] numpy arrays and write PNGs.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _save(fig, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=110)
    plt.close(fig)


def visualize_comparison(hazy, dehazed, clear, path: str,
                         titles=("Hazy", "Dehazed", "Clear"),
                         extra_text: Optional[Sequence[str]] = None):
    """Rows of hazy/dehazed/clear triptychs (reference: visualize.py:27-91)."""
    n = len(hazy)
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for i in range(n):
        for j, (img, title) in enumerate(zip((hazy[i], dehazed[i], clear[i]),
                                             titles)):
            axes[i][j].imshow(np.clip(img, 0, 1))
            axes[i][j].set_title(title if i == 0 else "")
            axes[i][j].axis("off")
        if extra_text and i < len(extra_text):
            axes[i][0].set_ylabel(extra_text[i], fontsize=8)
    _save(fig, path)


def visualize_detections(image, detections: Dict, path: str,
                         score_threshold: float = 0.5):
    """Draw detection boxes (reference: visualize.py:93-150)."""
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(np.clip(image, 0, 1))
    for box, score, label in zip(detections["boxes"], detections["scores"],
                                 detections["labels"]):
        if score < score_threshold:
            continue
        x1, y1, x2, y2 = box
        ax.add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1, fill=False,
                                   edgecolor="lime", linewidth=1.5))
        ax.text(x1, y1 - 2, f"{int(label)}:{score:.2f}", color="lime",
                fontsize=7)
    ax.axis("off")
    _save(fig, path)


def visualize_routing_weights(weights: np.ndarray, path: str,
                              names=("low", "medium", "high")):
    """Per-sample routing-weight bars (reference: visualize.py:152-191)."""
    n = len(weights)
    fig, ax = plt.subplots(figsize=(max(4, n * 0.6), 3))
    bottom = np.zeros(n)
    for i, name in enumerate(names):
        ax.bar(np.arange(n), weights[:, i], bottom=bottom, label=name)
        bottom += weights[:, i]
    ax.set_xlabel("sample")
    ax.set_ylabel("routing weight")
    ax.legend()
    _save(fig, path)


def visualize_montage(images: Sequence[np.ndarray], path: str, ncols: int = 4,
                      titles: Optional[Sequence[str]] = None):
    """Grid montage (reference: visualize.py:193-238)."""
    n = len(images)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 3 * nrows),
                             squeeze=False)
    for idx in range(nrows * ncols):
        ax = axes[idx // ncols][idx % ncols]
        ax.axis("off")
        if idx < n:
            ax.imshow(np.clip(images[idx], 0, 1))
            if titles and idx < len(titles):
                ax.set_title(titles[idx], fontsize=8)
    _save(fig, path)


def plot_training_curves(jsonl_path: str, out_path: str,
                         keys: Sequence[str] = ("train/loss", "val/loss")):
    """Plot metric curves from a MetricsLogger JSONL stream
    (reference: visualize.py:240-270 plotted torch histories)."""
    import json
    steps: Dict[str, List] = {k: [] for k in keys}
    vals: Dict[str, List] = {k: [] for k in keys}
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            for k in keys:
                if k in rec:
                    steps[k].append(rec["step"])
                    vals[k].append(rec[k])
    fig, ax = plt.subplots(figsize=(6, 4))
    for k in keys:
        if steps[k]:
            ax.plot(steps[k], vals[k], label=k)
    ax.set_xlabel("epoch")
    ax.legend()
    _save(fig, out_path)


def plot_summary_chart(summary: Dict[str, float], path: str,
                       title: str = "Evaluation summary"):
    """Bar chart of scalar results (reference: visualize.py:272-355)."""
    keys = list(summary)
    fig, ax = plt.subplots(figsize=(max(4, len(keys)), 4))
    ax.bar(keys, [summary[k] for k in keys])
    ax.set_title(title)
    ax.tick_params(axis="x", rotation=45)
    _save(fig, path)
