"""Regression pins for round-3 review findings: each test builds the
crafted input that would have broken the pre-fix code and runs the REAL
registered query (and, where the hazard was cross-engine, its actual
DuckDB oracle) against it."""

import math
import os
import shutil
import tempfile

import pandas as pd
import pytest

from copperhead_spark.plans.registry import all_queries
from copperhead_spark.testing import make_duckdb, run_query_vs_oracle

QUERIES = all_queries()


def test_corr_covar_survives_int64_moment_overflow(spark):
    """a14_corr_covar originally combined moments as n*syy in BIGINT,
    which wraps once Σy² * n exceeds 2^63 (~29k rows/group at real
    prices).  Crafted: 2000 rows with price ~3e6 → n*syy ≈ 3.6e19 >
    int64.  The DOUBLE-combine form must produce the numpy answer."""
    import numpy as np

    n = 2000
    qty = np.arange(n) % 50 + 1.0
    price = 3_000_000.0 + (np.arange(n) % 997)  # correlated-ish, huge y
    pdf = pd.DataFrame(
        {"l_returnflag": "A", "l_quantity": qty, "l_extendedprice": price}
    )
    d = tempfile.mkdtemp(prefix="corr_reg_")
    try:
        pdf.to_parquet(os.path.join(d, "lineitem.parquet"))
        row = QUERIES["a14_corr_covar"].builder(spark, d).collect()[0]
        xi = np.round(qty).astype(np.int64)
        yi = np.round(price).astype(np.int64)
        # bit-exact mirror of the query's own math: exact int moments,
        # then the identical DOUBLE combination in the same op order
        sx, sy = int(xi.sum()), int(yi.sum())
        sxy = int((xi * yi).sum())
        sxx, syy = int((xi * xi).sum()), int((yi * yi).sum())
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = math.sqrt(float(n) * float(sxx) - float(sx) * float(sx)) * math.sqrt(
            float(n) * float(syy) - float(sy) * float(sy)
        )
        assert math.isfinite(row["corr_qty_price"])
        assert row["corr_qty_price"] == num / den  # bitwise
        assert row["covar_pop_qty_price"] == num / (float(n) * float(n))  # bitwise
        # and the value is actually the correlation (conditioning sanity)
        assert row["corr_qty_price"] == pytest.approx(
            np.corrcoef(xi, yi)[0, 1], rel=1e-6, abs=1e-6
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bpe_encode_empty_word_cross_engine_parity(spark):
    """Spark split('', '') yields [''] where DuckDB chars('') yields [] —
    the one input the two merge folds disagree on.  Both engines now
    DROP empty words; crafted docs with doubled/leading/trailing spaces
    and an all-space text must hash-match the real oracle."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["the  thin  ant", " leading", "trailing ", "   "],
            "lang": "en",
            "source": "web",
            "n_chars": [14, 8, 9, 3],
        }
    )
    d = tempfile.mkdtemp(prefix="bpe_reg_")
    try:
        pdf.to_parquet(os.path.join(d, "documents.parquet"))
        rep = run_query_vs_oracle(
            spark, make_duckdb(d), QUERIES["text_bpe_encode"], d
        )
        assert rep.ok, str(rep)
        rows = {
            r["doc_id"]: r
            for r in QUERIES["text_bpe_encode"].builder(spark, d).collect()
        }
        # the all-space doc survives with the empty encoding
        assert rows[3]["n_tokens"] == 0 and rows[3]["seq_hash"] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_mm_decode_non_ascii_parity(spark):
    """fake_decode originally summed the first 32 UTF-8 BYTES while the
    oracle sums the first 32 CHARACTERS' code points — divergent on any
    non-ASCII document.  Crafted corpus with multi-byte characters must
    hash-match the real oracle."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["héllo wörld — ünïcode test für décode", "plain ascii doc"],
            "lang": "en",
            "source": "web",
            "n_chars": [38, 15],
        }
    )
    d = tempfile.mkdtemp(prefix="mm_reg_")
    try:
        pdf.to_parquet(os.path.join(d, "documents.parquet"))
        rep = run_query_vs_oracle(
            spark, make_duckdb(d), QUERIES["mm_decode_features"], d
        )
        assert rep.ok, str(rep)
    finally:
        shutil.rmtree(d, ignore_errors=True)
