"""Stack/ratio plot adapter on the collected histogram table
(/root/reference/stage3/plotter.py:94-249).

The reference builds mplhep stacked-MC + data-errorbar + ratio figures
from its histogram store.  This image has no matplotlib, so the adapter
is split the same way the ROOT writers are: ``build_plot_spec`` computes
EVERYTHING the figure shows — dense per-group bin arrays, ascending
integral-sorted stack order (plotter.py:291), cumulative stack outlines,
the statistical error band around the MC total, the data/MC ratio with
its errors, axis edges and the log-scale y-limits — as plain numpy in a
dict, and ``render_plot`` turns a spec into a matplotlib figure behind
an import-try.  Tests assert on the spec (axes contents, stack order,
totals, ratio math) — the same checks the reference's tests run against
figure axes (tests/test_stage3.py:20-68) — so everything except the
final draw call is exercised in this image.

The input is the COLLECTED stage-2/stage-3 histogram table: plotting
consumes O(categories x bins) rows, never event data — at 100 TB the
figure cost is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# plotter.py entry types: stacked MC, outline-only (signal), data points
ENTRY_TYPES = ("stack", "step", "errorbar")


def _dense(g: pd.DataFrame, nbins: int) -> tuple[np.ndarray, np.ndarray]:
    """bin_idx rows -> dense arrays; under/overflow folded into the edge
    bins (same TH1 convention as templates.to_template_arrays)."""
    values = np.zeros(nbins)
    sumw2 = np.zeros(nbins)
    for _, row in g.iterrows():
        b = int(row.bin_idx)
        b = 0 if b < 0 else (nbins - 1 if b >= nbins else b)
        values[b] += row.value
        sumw2[b] += row.sumw2
    return values, sumw2


def build_plot_spec(
    hist_pdf: pd.DataFrame,
    *,
    lo: float,
    hi: float,
    nbins: int,
    groups: dict[str, str],
    region: str | None = None,
    channel: str | None = None,
    variation: str = "nominal",
    group_col: str = "group",
) -> dict:
    """Everything a stack/ratio figure draws, as arrays.

    ``groups`` maps a group label -> entry type ('stack' for summed MC,
    'step' for outlined signal, 'errorbar' for data).  Slicing mirrors
    plotter.py's {region, channel, variation} slicer; pass None to skip
    a key (e.g. a pre-sliced table).
    """
    bad = {v for v in groups.values()} - set(ENTRY_TYPES)
    if bad:
        raise ValueError(f"unknown entry types: {sorted(bad)}")
    df = hist_pdf
    for col, want in (("region", region), ("channel", channel), ("variation", variation)):
        if want is not None and col in df:
            df = df[df[col] == want]

    per_group: dict[str, dict] = {}
    for label, entry_type in groups.items():
        g = df[df[group_col] == label]
        values, sumw2 = _dense(g, nbins)
        per_group[label] = {
            "type": entry_type,
            "values": values,
            "sumw2": sumw2,
            "integral": float(values.sum()),
        }

    # ascending-integral stack order (plotter.py:291): smallest group at
    # the bottom of the stack, ties broken by label for determinism
    stack_order = sorted(
        (k for k, v in per_group.items() if v["type"] == "stack"),
        key=lambda k: (per_group[k]["integral"], k),
    )
    stack_values = (
        np.vstack([per_group[k]["values"] for k in stack_order])
        if stack_order
        else np.zeros((0, nbins))
    )
    stack_cum = np.cumsum(stack_values, axis=0)
    total_mc = stack_cum[-1] if len(stack_order) else np.zeros(nbins)
    total_mc_sumw2 = (
        np.sum([per_group[k]["sumw2"] for k in stack_order], axis=0)
        if stack_order
        else np.zeros(nbins)
    )

    data_labels = [k for k, v in per_group.items() if v["type"] == "errorbar"]
    total_data = (
        np.sum([per_group[k]["values"] for k in data_labels], axis=0)
        if data_labels
        else np.zeros(nbins)
    )
    total_data_sumw2 = (
        np.sum([per_group[k]["sumw2"] for k in data_labels], axis=0)
        if data_labels
        else np.zeros(nbins)
    )

    # data/MC ratio panel (plotter.py:186-230): NaN where MC is empty
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(total_mc > 0, total_data / np.where(total_mc > 0, total_mc, 1.0), np.nan)
        ratio_err = np.where(
            total_mc > 0, np.sqrt(total_data_sumw2) / np.where(total_mc > 0, total_mc, 1.0), np.nan
        )
        # MC stat band around unity in the ratio panel
        mc_band = np.where(
            total_mc > 0, np.sqrt(total_mc_sumw2) / np.where(total_mc > 0, total_mc, 1.0), np.nan
        )

    return {
        "edges": np.linspace(lo, hi, nbins + 1),
        "centers": lo + (np.arange(nbins) + 0.5) * (hi - lo) / nbins,
        "groups": per_group,
        "stack_order": stack_order,
        "stack_cumulative": stack_cum,
        "total_mc": total_mc,
        "mc_stat_err": np.sqrt(total_mc_sumw2),
        "total_data": total_data,
        "data_err": np.sqrt(total_data_sumw2),
        "ratio": ratio,
        "ratio_err": ratio_err,
        "ratio_mc_band": mc_band,
        "total_yield": float(sum(v["integral"] for v in per_group.values())),
        "yscale": "log",
        "ylim": (0.01, 1e9),
        "slice": {"region": region, "channel": channel, "variation": variation},
    }


def render_plot(spec: dict, out_path: str, title: str = "") -> None:
    """Draw the spec with matplotlib (stacked fills + step outlines +
    data errorbars on top, ratio panel below).  Gated: matplotlib is not
    in this image; the spec carries every number the figure needs, so
    any renderer can consume it."""
    try:
        import matplotlib  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "figure rendering needs matplotlib; build_plot_spec output has "
            "all arrays (edges, stacks, ratio) for any renderer"
        ) from e
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(9.6, 10.0))
    gs = fig.add_gridspec(2, 1, height_ratios=[0.75, 0.25], hspace=0.07)
    ax1 = fig.add_subplot(gs[0])
    edges, centers = spec["edges"], spec["centers"]

    bottom = np.zeros(len(centers))
    for label in spec["stack_order"]:
        vals = spec["groups"][label]["values"]
        ax1.stairs(bottom + vals, edges, baseline=bottom, fill=True, label=label)
        bottom = bottom + vals
    if len(spec["stack_order"]):
        err = spec["mc_stat_err"]
        ax1.fill_between(
            centers, spec["total_mc"] - err, spec["total_mc"] + err,
            step="mid", alpha=0.3, color="gray", label="MC stat",
        )
    for label, v in spec["groups"].items():
        if v["type"] == "step":
            ax1.stairs(v["values"], edges, label=label)
        elif v["type"] == "errorbar":
            ax1.errorbar(
                centers, v["values"], yerr=np.sqrt(v["sumw2"]),
                fmt="o", color="black", label=label,
            )
    ax1.set_yscale(spec["yscale"])
    ax1.set_ylim(*spec["ylim"])
    ax1.legend(fontsize="x-small")
    ax1.set_title(title)
    ax1.tick_params(axis="x", labelbottom=False)

    ax2 = fig.add_subplot(gs[1], sharex=ax1)
    ax2.errorbar(centers, spec["ratio"], yerr=spec["ratio_err"], fmt="o", color="black")
    band = spec["ratio_mc_band"]
    ax2.fill_between(centers, 1 - band, 1 + band, step="mid", alpha=0.3, color="gray")
    ax2.axhline(1.0, linestyle="--", linewidth=1)
    ax2.set_ylim(0.5, 1.5)
    ax2.set_ylabel("Data/MC")

    fig.savefig(out_path)
    plt.close(fig)
