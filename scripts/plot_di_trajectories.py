"""Plot the CoRL-2020 double-integrator traces — parity with the reference
``scripts/double_integrator/plot_DI_test_trajectories.py``: track annulus +
state trajectories per variant, and the free-energy traces.

Usage: python scripts/plot_di_trajectories.py corl2020_out/ [--save out.png]
"""

import argparse
import os

import numpy as np

VARIANTS = ["vanilla", "vanilla_large", "tube", "robust"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, len(VARIANTS), figsize=(4 * len(VARIANTS), 8))
    theta = np.linspace(0, 2 * np.pi, 256)
    for j, tag in enumerate(VARIANTS):
        path = os.path.join(args.trace_dir, f"{tag}_state_trajectory.npy")
        if not os.path.exists(path):
            axes[0, j].set_title(f"{tag} (missing)")
            continue
        xs = np.load(path)
        fe = np.load(os.path.join(args.trace_dir, f"{tag}_free_energy.npy"))
        ax = axes[0, j]
        for r in (1.875, 2.125):
            ax.plot(r * np.cos(theta), r * np.sin(theta), "k--", lw=0.7)
        ax.plot(xs[:, 0], xs[:, 1], lw=0.8)
        ax.set_title(tag)
        ax.set_aspect("equal")
        axes[1, j].plot(fe)
        axes[1, j].set_ylabel("free energy mean")
        axes[1, j].set_xlabel("step")
    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=120)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
