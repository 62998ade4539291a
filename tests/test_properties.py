"""Property-based tests (hypothesis) for the determinism-critical kernels.

The oracle-parity suite pins fixed datasets; these properties check the
*invariants* the engine's correctness story rests on: fixed-point sums
are partitioning-independent, the shared SQL formulas behave across
their whole domain, hash-uniforms are reproducible."""

import math

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from copperhead_spark.functions.physics import delta_phi_sql
from copperhead_spark.operators.dedup import minhash_signature
from copperhead_spark.operators.rochester import hash_uniform_sql

_money = st.decimals(
    min_value=-1_000_000, max_value=1_000_000, places=2, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_money, min_size=1, max_size=300), st.integers(1, 16))
def test_exact_sum_partitioning_independent(spark_prop, values, nparts):
    """sum is bit-identical no matter how rows are partitioned."""
    from pyspark.sql import functions as F

    from copperhead_spark.functions.exact import exact_sum

    floats = [float(v) for v in values]
    df = spark_prop.createDataFrame([(v,) for v in floats], "x double").repartition(nparts)
    got = df.agg(exact_sum(F.col("x")).alias("s")).collect()[0]["s"]
    expected = sum(int(round(v * 100)) for v in floats) / 100.0
    assert got == expected  # bitwise


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-50, 50, allow_nan=False),
    st.floats(-50, 50, allow_nan=False),
    st.integers(-3, 3),
)
def test_delta_phi_wrap_domain_and_periodicity(p1, p2, k):
    """The shared delta-phi formula lands in [-pi, pi] and is 2pi-periodic
    (checked through DuckDB — same text Spark evaluates)."""
    con = duckdb.connect()
    a = f"CAST({p1!r} AS DOUBLE)"
    b = f"CAST({p2!r} AS DOUBLE)"
    shifted = f"({a} + CAST({2 * math.pi * k!r} AS DOUBLE))"
    d1 = con.execute(f"SELECT {delta_phi_sql(a, b)}").fetchone()[0]
    d2 = con.execute(f"SELECT {delta_phi_sql(shifted, b)}").fetchone()[0]
    assert -math.pi - 1e-9 <= d1 <= math.pi + 1e-9
    assert abs(d1 - d2) < 1e-6 or abs(abs(d1 - d2) - 2 * math.pi) < 1e-6


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**12), st.integers(0, 10**6))
def test_hash_uniform_range_and_determinism(event, idx):
    con = duckdb.connect()
    sql = f"SELECT {hash_uniform_sql(str(event), str(idx))}"
    u1 = con.execute(sql).fetchone()[0]
    u2 = con.execute(sql).fetchone()[0]
    assert 0.0 <= u1 < 1.0
    assert u1 == u2


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcdefgh ", min_size=5, max_size=200))
def test_minhash_identity_and_permutation_bound(text):
    """Identical texts -> identical signatures; any text's signature
    values stay under the modulus."""
    s1 = minhash_signature(text)
    s2 = minhash_signature(text)
    assert s1 == s2
    assert all(0 <= v < 2147483647 for v in s1)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=8, unique=True),
    st.floats(-150, 150, allow_nan=False),
)
def test_interp_formula_matches_numpy(xs, x):
    from copperhead_spark.operators.lookup import interp1d_sql

    xs = sorted(xs)
    ys = [float(np.sin(v)) for v in xs]  # arbitrary node values
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {interp1d_sql(f'CAST({x!r} AS DOUBLE)', xs, ys)}"
    ).fetchone()[0]
    expected = float(np.interp(x, xs, ys))
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark


def _token_hash_ref(w: str) -> int:
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % 1_000_003
    return h


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=30,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_token_hashes_np_matches_reference(texts):
    """The vectorized char-position kernel must equal the per-token
    polynomial for arbitrary docs: empty docs, doubled spaces, leading/
    trailing spaces, non-ASCII."""
    from copperhead_spark.operators.sketch_kernels import token_hashes_np

    got = token_hashes_np(texts).tolist()
    want = [
        _token_hash_ref(w)
        for w in " ".join(texts).split(" ")
    ]
    assert got == want
