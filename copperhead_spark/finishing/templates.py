"""Template and datacard emission on collected aggregates
(SURVEY.md §2.11; /root/reference/stage3/make_templates.py:56-223,
make_datacards.py:64-113).

The reference merges per-partition histogram pickles, sums per
dataset-group, renames/decorrelates systematics, writes ROOT TH1s and a
text datacard.  Here the histogram DataFrame IS the template store: group
summation is a second groupBy (done in Spark before collect), and this
module formats the collected table into template arrays and a
reference-shaped text datacard.  ROOT TH1 output uses uproot when
present; in this image it falls back to the pure-python TH1F writer
(sources/rootio.py), so the sink runs and is round-trip-tested here."""

from __future__ import annotations

import numpy as np
import pandas as pd


def group_templates(
    hist_pdf: pd.DataFrame,
    grouping: dict[str, str],
    nbins: int,
    group_col: str = "dataset",
) -> pd.DataFrame:
    """dataset -> group summation (make_templates.py:128-155): map each
    dataset to its group and re-sum value/sumw2 per (group, bin)."""
    df = hist_pdf.copy()
    df["group"] = df[group_col].map(grouping)
    keys = [c for c in ("group", "region", "channel", "variation", "bin_idx") if c in df]
    return df.groupby(keys, as_index=False)[["value", "sumw2"]].sum()


def to_template_arrays(grouped: pd.DataFrame, nbins: int) -> dict:
    """Dense per-category arrays (TH1 analogue): zero-filled bins,
    under/overflow folded into the edge bins like the reference's TH1
    conversion (make_templates.py:190-195)."""
    out = {}
    keys = [c for c in ("group", "region", "channel", "variation") if c in grouped]
    for key, g in grouped.groupby(keys):
        values = np.zeros(nbins)
        sumw2 = np.zeros(nbins)
        for _, row in g.iterrows():
            b = int(row.bin_idx)
            b = 0 if b < 0 else (nbins - 1 if b >= nbins else b)
            values[b] += row.value
            sumw2[b] += row.sumw2
        out[key] = {"values": values, "sumw2": sumw2}
    return out


def write_root_templates(
    templates: dict, out_path: str, xlo: float = 0.0, xhi: float | None = None
) -> None:
    """TH1 sink (S8, io.py:230-235 save_template): uproot when present
    (stock-ROOT-readable output), else the pure-python TH1F writer
    (sources/rootio.py — real TKey/TArray layouts, streamer-free; see
    that module's honesty note).  Bin contents land in bins 1..nbins
    with empty under/overflow, matching the reference's TH1 conversion."""
    try:
        import uproot  # noqa: F401

        with uproot.recreate(out_path) as f:  # pragma: no cover - uproot absent
            for key, t in templates.items():
                name = "_".join(map(str, key if isinstance(key, tuple) else (key,)))
                f[name] = (t["values"], np.arange(len(t["values"]) + 1))
        return
    except ImportError:
        pass
    from copperhead_spark.sources.rootio import write_th1f

    hists = []
    for key, t in templates.items():
        name = "_".join(map(str, key if isinstance(key, tuple) else (key,)))
        nbins = len(t["values"])
        contents = np.zeros(nbins + 2)
        contents[1:-1] = t["values"]
        sumw2 = np.zeros(nbins + 2)
        sumw2[1:-1] = t.get("sumw2", np.zeros(nbins))
        hists.append(
            dict(
                name=name,
                title=name,
                nbins=nbins,
                xlo=xlo,
                xhi=float(nbins) if xhi is None else xhi,
                contents=contents,
                sumw2=sumw2,
            )
        )
    write_th1f(out_path, hists)


def make_datacard(
    yields: pd.DataFrame,
    signal_groups: tuple[str, ...],
    observation: float | None = None,
    lnN: dict[str, dict[str, float]] | None = None,
) -> str:
    """Text datacard emission (make_datacards.py:64-113): one channel bin,
    processes ordered signal-first with signal indices <= 0, rate line
    from the yields table, lnN systematic lines."""
    groups = list(yields["group"])
    rates = list(yields["yield"])
    sig = [g for g in groups if g in signal_groups]
    bkg = [g for g in groups if g not in signal_groups]
    ordered = sig + bkg
    idx = {g: (i - len(sig) + 1) for i, g in enumerate(ordered)}
    rate = {g: r for g, r in zip(groups, rates)}
    obs = observation if observation is not None else sum(rates)

    lines = [
        "imax 1 number of channels",
        f"jmax {len(ordered) - 1} number of backgrounds",
        f"kmax {len(lnN or {})} number of nuisance parameters",
        "-" * 40,
        "bin          ch1",
        f"observation  {obs:.4f}",
        "-" * 40,
        "bin          " + " ".join("ch1" for _ in ordered),
        "process      " + " ".join(ordered),
        "process      " + " ".join(str(idx[g]) for g in ordered),
        "rate         " + " ".join(f"{rate[g]:.4f}" for g in ordered),
        "-" * 40,
    ]
    for name, per_group in (lnN or {}).items():
        cells = [f"{per_group[g]:.3f}" if g in per_group else "-" for g in ordered]
        lines.append(f"{name:<12} lnN " + " ".join(cells))
    return "\n".join(lines) + "\n"
