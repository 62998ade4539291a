"""Parametric fits on collected histogram data (SURVEY.md §2.11).

The reference fits parametric PDFs to the unbinned/binned mass column
with RooFit (bwZ / bwZredux / bwGamma / bernstein / chebyshev,
/root/reference/stage3/fit_models.py:20-392) and picks the best model
per (label, channel, category) by minimum chi2
(/root/reference/stage3/fitter.py:40-52).

Here: numpy-only chi2 fits over the *collected* histogram table (the
heavy lifting — binning — already happened distributed in stage 2; a fit
consumes O(nbins) numbers, exactly like the reference's per-category
RooFit calls).  Linear-in-coefficients families (chebyshev, bernstein,
power series) solve exactly via weighted least squares; the
Breit-Wigner family profiles its linear normalization and golden-section
searches the width.  No scipy dependency.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np


@dataclass
class FitResult:
    model: str
    params: np.ndarray
    chi2: float
    ndf: int
    yhat: np.ndarray

    @property
    def chi2_ndf(self) -> float:
        return self.chi2 / max(self.ndf, 1)


def _weighted_lstsq(basis: np.ndarray, y: np.ndarray, sigma: np.ndarray):
    w = 1.0 / np.where(sigma > 0, sigma, 1.0)
    coef, *_ = np.linalg.lstsq(basis * w[:, None], y * w, rcond=None)
    yhat = basis @ coef
    chi2 = float(np.sum(((y - yhat) * w) ** 2))
    return coef, chi2, yhat


def chebyshev_basis(x: np.ndarray, degree: int) -> np.ndarray:
    # map x to [-1, 1] over its range (fit_models.py chebyshev family)
    t = 2 * (x - x.min()) / (x.max() - x.min()) - 1
    cols = [np.ones_like(t), t]
    for _ in range(2, degree + 1):
        cols.append(2 * t * cols[-1] - cols[-2])
    return np.column_stack(cols[: degree + 1])


def bernstein_basis(x: np.ndarray, degree: int) -> np.ndarray:
    t = (x - x.min()) / (x.max() - x.min())
    return np.column_stack(
        [
            math.comb(degree, k) * t**k * (1 - t) ** (degree - k)
            for k in range(degree + 1)
        ]
    )


def fit_chebyshev(x, y, sigma, degree: int = 3) -> FitResult:
    coef, chi2, yhat = _weighted_lstsq(chebyshev_basis(x, degree), y, sigma)
    return FitResult(f"chebyshev{degree}", coef, chi2, len(x) - (degree + 1), yhat)


def fit_bernstein(x, y, sigma, degree: int = 3) -> FitResult:
    coef, chi2, yhat = _weighted_lstsq(bernstein_basis(x, degree), y, sigma)
    return FitResult(f"bernstein{degree}", coef, chi2, len(x) - (degree + 1), yhat)


def _bw_shape(x: np.ndarray, mass: float, width: float) -> np.ndarray:
    return width / ((x * x - mass * mass) ** 2 + mass * mass * width * width)


def fit_bwz(x, y, sigma, mass: float = 91.1876) -> FitResult:
    """Breit-Wigner (Z lineshape, fit_models.py bwZ): profile the linear
    norm, golden-section the width — robust, derivative-free."""

    def chi2_of(width: float) -> tuple[float, np.ndarray]:
        basis = _bw_shape(x, mass, width)[:, None]
        coef, chi2, yhat = _weighted_lstsq(basis, y, sigma)
        return chi2, np.array([coef[0], width]), yhat

    lo, hi = 0.1, 60.0
    phi = (1 + 5**0.5) / 2
    a, b = lo, hi
    c, d = b - (b - a) / phi, a + (b - a) / phi
    for _ in range(60):
        if chi2_of(c)[0] < chi2_of(d)[0]:
            b = d
        else:
            a = c
        c, d = b - (b - a) / phi, a + (b - a) / phi
    chi2, params, yhat = chi2_of((a + b) / 2)
    return FitResult("bwZ", params, chi2, len(x) - 2, yhat)


def _golden_min(f, lo: float, hi: float, iters: int = 60) -> float:
    """Derivative-free 1-D minimizer (same scheme as fit_bwz)."""
    phi = (1 + 5**0.5) / 2
    a, b = lo, hi
    c, d = b - (b - a) / phi, a + (b - a) / phi
    for _ in range(iters):
        if f(c) < f(d):
            b = d
        else:
            a = c
        c, d = b - (b - a) / phi, a + (b - a) / phi
    return (a + b) / 2


def _profiled_coordinate_fit(
    model: str,
    shape,
    x: np.ndarray,
    y: np.ndarray,
    sigma: np.ndarray,
    params0: list[float],
    bounds: list[tuple[float, float]],
    sweeps: int = 8,
) -> FitResult:
    """Nonlinear families with a profiled linear normalization: cyclic
    coordinate descent, each coordinate minimized by golden section with
    the norm re-solved exactly per evaluation (weighted lstsq on the
    single shape column).  Deterministic — no RNG, no scipy."""
    p = list(params0)

    def chi2_at(q: list[float]) -> tuple[float, np.ndarray, np.ndarray]:
        with np.errstate(over="ignore", invalid="ignore", divide="ignore"):
            basis = shape(x, *q)[:, None]
        if not np.all(np.isfinite(basis)):
            # out-of-domain shape (e.g. exp overflow on a wildly scaled
            # x): this family simply cannot describe the data here
            return float("inf"), np.zeros(1), np.zeros_like(y)
        coef, chi2, yhat = _weighted_lstsq(basis, y, sigma)
        return chi2, coef, yhat

    for _ in range(sweeps):
        for i, (lo, hi) in enumerate(bounds):

            def f(v: float, i: int = i) -> float:
                q = p.copy()
                q[i] = v
                return chi2_at(q)[0]

            p[i] = _golden_min(f, lo, hi, iters=40)
    chi2, coef, yhat = chi2_at(p)
    return FitResult(
        model,
        np.array([coef[0], *p]),
        chi2,
        len(x) - (len(p) + 1),
        yhat,
    )


def _bwz_redux_shape(x: np.ndarray, a1: float, a2: float, a3: float) -> np.ndarray:
    """fit_models.py bwZredux: exp(a2*(x/100) + a3*(x/100)^2) * 2.5 /
    ((x - 91.2)^a1 + (2.5/2)^a1) — perturbed exponential times an
    off-power Breit-Wigner."""
    t = x / 100.0
    return (
        np.exp(a2 * t + a3 * t * t)
        * 2.5
        / (np.abs(x - 91.2) ** a1 + (2.5 / 2.0) ** a1)
    )


def fit_bwz_redux(x, y, sigma) -> FitResult:
    return _profiled_coordinate_fit(
        "bwZredux",
        _bwz_redux_shape,
        x,
        y,
        sigma,
        params0=[1.39, 0.46, -0.26],
        bounds=[(0.7, 2.1), (0.30, 0.62), (-0.40, -0.12)],
    )


def _bw_gamma_shape(x: np.ndarray, exp_param: float) -> np.ndarray:
    """fit_models.py bwGamma: exp(x * expParam) * x^-2 — the photon
    contribution, falling exponential over 1/x^2."""
    return np.exp(x * exp_param) / (x * x)


def fit_bw_gamma(x, y, sigma) -> FitResult:
    def f(v: float) -> float:
        with np.errstate(over="ignore", invalid="ignore"):
            basis = _bw_gamma_shape(x, v)[:, None]
        if not np.all(np.isfinite(basis)):
            return float("inf")
        _, chi2, _ = _weighted_lstsq(basis, y, sigma)
        return chi2

    best = _golden_min(f, -0.1, 0.1)
    with np.errstate(over="ignore", invalid="ignore"):
        basis = _bw_gamma_shape(x, best)[:, None]
    if not np.all(np.isfinite(basis)):
        return FitResult(
            "bwGamma", np.array([0.0, best]), float("inf"), len(x) - 2, np.zeros_like(y)
        )
    coef, chi2, yhat = _weighted_lstsq(basis, y, sigma)
    return FitResult(
        "bwGamma", np.array([coef[0], best]), chi2, len(x) - 2, yhat
    )


def _double_cb_shape(
    x: np.ndarray,
    mean: float,
    sigma_: float,
    alpha1: float,
    n1: float,
    alpha2: float,
    n2: float,
) -> np.ndarray:
    """RooDoubleCB (fit_models.py:384-392): Gaussian core with power-law
    tails below -alpha1 and above +alpha2 (in pulls t = (x-mean)/sigma),
    continuous and differentiable at the junctions."""
    t = (x - mean) / sigma_
    a1_ = np.exp(-0.5 * alpha1 * alpha1) * (n1 / alpha1) ** n1
    b1 = n1 / alpha1 - alpha1
    a2_ = np.exp(-0.5 * alpha2 * alpha2) * (n2 / alpha2) ** n2
    b2 = n2 / alpha2 - alpha2
    core = np.exp(-0.5 * t * t)
    left = a1_ * (b1 - t) ** (-n1)
    right = a2_ * (b2 + t) ** (-n2)
    return np.where(t < -alpha1, left, np.where(t > alpha2, right, core))


def fit_double_cb(x, y, sigma) -> FitResult:
    return _profiled_coordinate_fit(
        "doubleCB",
        _double_cb_shape,
        x,
        y,
        sigma,
        params0=[125.0, 2.0, 2.0, 1.5, 2.0, 1.5],
        bounds=[
            (120.0, 130.0),
            (0.3, 5.0),
            (0.3, 10.0),
            (0.1, 10.0),
            (0.3, 10.0),
            (0.1, 10.0),
        ],
        # 6 correlated params need more cycles than the 3-param families
        sweeps=40,
    )


# the reference's six-model menu (fit_models.py:20-392): three linear-in-
# coefficient polynomial/series families solved exactly, three nonlinear
# lineshapes via profiled-norm golden-section / coordinate descent
FAMILIES = {
    "chebyshev3": lambda x, y, s: fit_chebyshev(x, y, s, 3),
    "bernstein3": lambda x, y, s: fit_bernstein(x, y, s, 3),
    "bwZ": fit_bwz,
    "bwZredux": fit_bwz_redux,
    "bwGamma": fit_bw_gamma,
    "doubleCB": fit_double_cb,
}


def select_best_model(
    x: np.ndarray, y: np.ndarray, sigma: np.ndarray, families=FAMILIES
) -> FitResult:
    """chi2-argmin model selection (fitter.py:40-52): fit every family,
    keep the minimum chi2/ndf.  Families whose shape blows up on this
    x-range (non-finite chi2) are excluded, mirroring the reference's
    chi2<=0 -> 999 guard."""
    results = [fit(x, y, sigma) for fit in families.values()]
    finite = [r for r in results if math.isfinite(r.chi2)]
    return min(finite or results, key=lambda r: r.chi2_ndf)


def _fit_task(task) -> FitResult:
    """Process-pool worker: one (family, category) fit.  Module-level so
    it pickles by reference under both fork and spawn."""
    fam, x, y, sigma = task
    return FAMILIES[fam](x, y, sigma)


def fit_families_all(
    groups: dict, families=FAMILIES, parallel: bool = True
) -> dict:
    """Fit EVERY family on every category at once: groups maps key ->
    (x, y, sigma); returns key -> [FitResult in `families` order].

    The (category x family) grid is embarrassingly parallel and each
    task is pure CPU-bound Python/numpy (golden-section loops around
    tiny lstsq calls — the GIL serializes them in-process), so the grid
    runs on a fork process pool sized to the driver host.  Numerics are
    BIT-IDENTICAL to the serial loop: the same fit functions run on the
    same inputs, one task per (key, family), results re-assembled by
    index — processes only remove the GIL, they change no arithmetic.
    Any pool failure (exotic hosts without fork) falls back to the
    serial loop."""
    fam_names = list(families)
    keys = list(groups)
    tasks = [
        (fam, *groups[key]) for key in keys for fam in fam_names
    ]
    results: list[FitResult] | None = None
    # the pool worker resolves families from the module-level FAMILIES;
    # custom family dicts (tests) take the serial path
    if (
        parallel
        and len(tasks) > 1
        and os.name == "posix"
        and families is FAMILIES
    ):
        try:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            nproc = min(len(tasks), os.cpu_count() or 4)
            with ctx.Pool(processes=nproc) as pool:
                results = pool.map(_fit_task, tasks, chunksize=1)
        except Exception:  # noqa: BLE001 - serial fallback, same numbers
            results = None
    if results is None:
        results = [families[t[0]](*t[1:]) for t in tasks]
    nfam = len(fam_names)
    return {
        key: results[i * nfam : (i + 1) * nfam] for i, key in enumerate(keys)
    }


def fit_histogram_table(
    hist_pdf, lo: float, hi: float, nbins: int, by=("region", "channel")
) -> dict:
    """Group the collected histogram table and fit each category — the
    per-(channel, category) fan-out of fitter.py:12-128, driver-side on
    tiny data."""
    width = (hi - lo) / nbins
    groups = {}
    for key, g in hist_pdf.groupby(list(by)):
        g = g[(g.bin_idx >= 0) & (g.bin_idx < nbins)].sort_values("bin_idx")
        if len(g) < 6:
            continue
        x = lo + (g.bin_idx.to_numpy() + 0.5) * width
        y = g.value.to_numpy()
        sigma = np.sqrt(np.maximum(g.sumw2.to_numpy(), 1e-12))
        groups[key] = (x, y, sigma)
    # every (category x family) fit on the fork pool at once (r12:
    # wall / ncores, bit-identical results), then the same finite-filter
    # chi2/ndf argmin as select_best_model per category
    all_fits = fit_families_all(groups)
    out = {}
    for key, results in all_fits.items():
        finite = [r for r in results if math.isfinite(r.chi2)]
        out[key] = min(finite or results, key=lambda r: r.chi2_ndf)
    return out
