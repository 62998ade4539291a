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


FAMILIES = {
    "chebyshev3": lambda x, y, s: fit_chebyshev(x, y, s, 3),
    "bernstein3": lambda x, y, s: fit_bernstein(x, y, s, 3),
    "bwZ": fit_bwz,
}


def select_best_model(
    x: np.ndarray, y: np.ndarray, sigma: np.ndarray, families=FAMILIES
) -> FitResult:
    """chi2-argmin model selection (fitter.py:40-52): fit every family,
    keep the minimum chi2/ndf."""
    results = [fit(x, y, sigma) for fit in families.values()]
    return min(results, key=lambda r: r.chi2_ndf)


def fit_histogram_table(
    hist_pdf, lo: float, hi: float, nbins: int, by=("region", "channel")
) -> dict:
    """Group the collected histogram table and fit each category — the
    per-(channel, category) fan-out of fitter.py:12-128, driver-side on
    tiny data."""
    out = {}
    width = (hi - lo) / nbins
    for key, g in hist_pdf.groupby(list(by)):
        g = g[(g.bin_idx >= 0) & (g.bin_idx < nbins)].sort_values("bin_idx")
        if len(g) < 6:
            continue
        x = lo + (g.bin_idx.to_numpy() + 0.5) * width
        y = g.value.to_numpy()
        sigma = np.sqrt(np.maximum(g.sumw2.to_numpy(), 1e-12))
        out[key] = select_best_model(x, y, sigma)
    return out
