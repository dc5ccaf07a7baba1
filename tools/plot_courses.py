"""Loss-course artifacts from the chained-solve logs.

Reads the course logs (iter loss seconds ...) and writes
artifacts/latteart_chain_course.png and
artifacts/circulation_r4_course.png.  Static matplotlib PNGs styled per
the dataviz method: change-over-time -> line form, one axis, thin 2px
lines, recessive grid, direct-labeled endpoints, validated categorical
palette (slots 1-2: #2a78d6 blue / #eb6834 orange on #fcfcfb).
"""
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
BLUE = "#2a78d6"
ORANGE = "#eb6834"


def read_course(path):
    iters, losses = [], []
    if not os.path.exists(path):
        return np.array([]), np.array([])
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                try:
                    iters.append(int(parts[0]))
                    losses.append(float(parts[1]))
                except ValueError:
                    pass
    return np.asarray(iters), np.asarray(losses)


def style_ax(ax):
    ax.set_facecolor(SURFACE)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=9)
    ax.grid(True, axis="y", color="#e8e7e3", lw=0.8)
    ax.set_axisbelow(True)


def endpoint_label(ax, x, y, text, color):
    ax.annotate(
        text, (x, y), textcoords="offset points", xytext=(6, 0),
        fontsize=9, color=color, va="center", fontweight="bold",
    )


def main():
    os.makedirs("artifacts", exist_ok=True)

    # --- LatteArt chain (single series: no legend, title names it)
    it, lo = read_course(os.environ.get("FL_LATTE_COURSE", "artifacts/r4b/latte_chain_course.log"))
    if len(it):
        fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=110)
        fig.patch.set_facecolor(SURFACE)
        style_ax(ax)
        ax.plot(it, lo, color=BLUE, lw=2)
        ax.set_yscale("log")
        ax.set_xlabel("Adam iteration", color=INK2, fontsize=10)
        ax.set_ylabel("rollout loss (log)", color=INK2, fontsize=10)
        ax.set_title(
            "LatteArt full-spec trajectory optimization — chained solve "
            "(115k particles, H=330, one TPU v5e)",
            color=INK, fontsize=10.5, loc="left",
        )
        endpoint_label(ax, it[-1], lo[-1], f"{lo[-1]:,.0f}", BLUE)
        endpoint_label(ax, it[0], lo[0], f"{lo[0]:,.0f}", INK2)
        fig.tight_layout()
        fig.savefig("artifacts/latteart_chain_course.png",
                    facecolor=SURFACE)
        print(f"latteart: {len(it)} iters, {lo[0]:.0f} -> {lo[-1]:.0f}")

    # --- Circulation: cold-start w/ schedule vs r3 constant-lr (two
    # entities -> legend + direct labels)
    itc, loc_ = read_course(os.environ.get("FL_CIRC_COURSE", "artifacts/r4b/circ_cold_course.log"))
    it3, lo3 = read_course("artifacts/circulation_r3_course.log")
    if not len(it3):
        # r3 log format: "=======> iter N: loss X fwd+bwd Ys"
        rows = []
        p = "artifacts/circulation_r3_course.log"
        if os.path.exists(p):
            for line in open(p):
                if "iter" in line and "loss" in line:
                    t = line.split()
                    try:
                        rows.append((int(t[2].rstrip(":")), float(t[4])))
                    except (ValueError, IndexError):
                        pass
        if rows:
            it3, lo3 = map(np.asarray, zip(*rows))
    if len(itc):
        fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=110)
        fig.patch.set_facecolor(SURFACE)
        style_ax(ax)
        if len(it3):
            ax.plot(it3, lo3, color=ORANGE, lw=2, ls=(0, (4, 2)),
                    label="r3: constant lr 5e-3 (identical seed; curves "
                          "coincide until the first halving at iter 61)")
        ax.plot(itc, loc_, color=BLUE, lw=2,
                label="r4: plateau-halving lr schedule (patience 20)")
        for dx in (61, 81, 102):  # lr halvings (course log lr column)
            if len(itc) and dx <= itc[-1]:
                ax.axvline(dx, color="#e8e7e3", lw=1, zorder=0)
        ax.set_xlabel("Adam iteration", color=INK2, fontsize=10)
        ax.set_ylabel("rollout loss", color=INK2, fontsize=10)
        ax.set_title(
            "Circulation (smoke, H=500) — lr schedule vs constant lr",
            color=INK, fontsize=10.5, loc="left",
        )
        leg = ax.legend(frameon=False, fontsize=9, loc="upper right")
        for t in leg.get_texts():
            t.set_color(INK2)
        endpoint_label(ax, itc[-1], loc_[-1], f"{loc_[-1]:,.0f}", BLUE)
        if len(it3):
            endpoint_label(ax, it3[-1], lo3[-1], f"{lo3[-1]:,.0f}", ORANGE)
        fig.tight_layout()
        fig.savefig("artifacts/circulation_r4_course.png",
                    facecolor=SURFACE)
        print(f"circulation: {len(itc)} iters")


if __name__ == "__main__":
    main()
