"""Documents the three LR schedules (ref examples/lr_scheduler.py:13-68):
manual warmup-cosine, the SequentialLR warmup→cosine used by the trainer, and
warmup→constant→cosine. Prints a table; plots if matplotlib is available."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from noise_robust_vit_tpu.train.optim import (
    multistep,
    warmup_constant_cosine,
    warmup_cosine,
)


def main(total_steps=1000, base_lr=1e-3):
    schedules = {
        "warmup_cosine": warmup_cosine(base_lr, total_steps),
        "warmup_constant_cosine": warmup_constant_cosine(base_lr, total_steps),
        "multistep": multistep(base_lr, [total_steps // 2, (3 * total_steps) // 4]),
    }
    xs = np.linspace(0, total_steps - 1, 11).astype(int)
    header = "step      " + "  ".join(f"{n:>24}" for n in schedules)
    print(header)
    for s in xs:
        row = f"{s:>8}  " + "  ".join(
            f"{float(fn(s)):>24.6f}" for fn in schedules.values()
        )
        print(row)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = np.arange(total_steps)
        for name, fn in schedules.items():
            plt.plot(steps, [float(fn(s)) for s in steps], label=name)
        plt.legend()
        plt.xlabel("step")
        plt.ylabel("lr")
        plt.savefig("lr_schedules.png", dpi=120)
        print("wrote lr_schedules.png")
    except Exception:
        pass


if __name__ == "__main__":
    main()
