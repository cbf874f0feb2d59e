"""Population-trajectory figure (parity with
/root/reference/rafft/rafft_kin.py:18-45)."""

from __future__ import annotations

import numpy as np


def plot_traj(trajectory, struct_list, times, font_size, width, height,
              show_thres, out_file=None):
    import matplotlib
    if out_file is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    trajectory = np.array(trajectory).real

    plt.rcParams["font.family"] = "serif"
    plt.rcParams["font.size"] = font_size
    plt.rcParams["figure.figsize"] = width, height
    left, w = 0.10, 0.88
    bottom, h = 0.10, 0.88
    fig = plt.figure(1)
    kin_f = fig.add_axes([left, bottom, w, h])
    kin_f.grid(True, color="grey", linestyle="--", linewidth=0.2)
    kin_f.set_xlim([times[0], times[-1]])

    for si, _struct in enumerate(struct_list):
        if any(trajectory[:, si] > show_thres):
            kin_f.plot(times, trajectory[:, si], alpha=0.8, label=si)

    kin_f.set_xscale("log")
    kin_f.legend(ncol=2, fontsize=int(font_size * 0.8))
    if out_file is not None:
        plt.savefig(out_file, dpi=300, transparent=True)
    else:
        plt.show()
