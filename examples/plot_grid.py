"""Illustrative G-matrix (label-grouping structure) figures
(ref examples/plot_grid.py): visualizes the same-label pair matrix used by
sup_ssl's invariance loss for supervised vs instance-label (DIET) vs grouped
pseudo-labels."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def g_matrix(labels):
    labels = np.asarray(labels)
    return (labels[:, None] == labels[None, :]).astype(np.float32)


def main():
    n = 32
    rng = np.random.default_rng(0)
    supervised = g_matrix(rng.integers(0, 4, n))
    diet = g_matrix(np.arange(n))  # identity: every sample its own class
    grouped = g_matrix(rng.integers(0, 8, n))
    mats = {"supervised": supervised, "diet": diet, "grouped": grouped}
    for name, m in mats.items():
        print(f"{name}: G shape {m.shape}, positive pairs "
              f"{int(m.sum() - n)} (off-diagonal)")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(9, 3))
        for ax, (name, m) in zip(axes, mats.items()):
            ax.imshow(m, cmap="gray_r")
            ax.set_title(name)
            ax.axis("off")
        fig.savefig("g_matrices.png", dpi=120, bbox_inches="tight")
        print("wrote g_matrices.png")
    except Exception:
        pass


if __name__ == "__main__":
    main()
