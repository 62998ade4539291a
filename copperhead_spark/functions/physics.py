"""Kinematics expression library (SURVEY.md §2.8 ★: p4_sum, delta_r,
delta_phi, rapidity, Collins-Soper angles — the vectorized numpy kernels
of /root/reference/python/math_tools.py:5-224 re-expressed as Spark SQL
column expressions).

Cross-engine determinism strategy: every formula is generated ONCE as SQL
text and evaluated verbatim by both Spark (`F.expr`) and the DuckDB
oracle, so the expression *tree* is identical.  +, -, *, /, sqrt are
IEEE-correctly-rounded => bit-identical everywhere; transcendentals
(sin/cos/exp/ln) are only ulp-accurate per libm, so any oracle-checked
aggregate of those goes through fixed-point rounding at a scale where a
few-ulp wobble cannot flip the rounded integer (functions/exact.py).
sinh is spelled out as (exp(x)-exp(-x))/2 because DuckDB 1.0 lacks it —
same text on both sides keeps the trees aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PI = "3.141592653589793"
TWO_PI = "6.283185307179586"
MU_MASS = "0.105658"


def delta_phi_sql(p1: str, p2: str) -> str:
    """Wrap phi1-phi2 into [-pi, pi) (math_tools.py:220-224 delta_r's
    phi handling). floor-based wrap: deterministic, no modulo-sign
    pitfalls."""
    d = f"(({p1}) - ({p2}))"
    return f"({d} - {TWO_PI} * FLOOR(({d} + {PI}) / {TWO_PI}))"


def delta_r_sql(deta: str, dphi: str) -> str:
    return f"SQRT(({deta}) * ({deta}) + ({dphi}) * ({dphi}))"


def sinh_sql(x: str) -> str:
    return f"((EXP({x}) - EXP(-({x}))) / 2)"


# Staged column definitions: each stage may reference columns named in
# earlier stages.  Consumed by both `apply_stages` (Spark selectExpr) and
# `stages_to_sql` (nested subqueries for the oracle) — identical text.
def pseudo_dimuon_stages() -> list[list[tuple[str, str]]]:
    """Two pseudo-particles derived from lineitem columns (the testdata
    has no jagged muons; this maps the p4 math onto flat columns —
    fill_muons/fill_jets shape, stage1/muons.py:6-71)."""
    return [
        [
            ("pt1", "l_extendedprice / CAST(1000 AS DOUBLE)"),
            ("eta1", "(l_discount - 0.05) * 40"),
            ("phi1", f"{PI} * (2 * ((l_partkey % 1000) / CAST(1000 AS DOUBLE)) - 1)"),
            ("pt2", "l_quantity * CAST(3 AS DOUBLE)"),
            ("eta2", "(l_tax - 0.04) * 50"),
            ("phi2", f"{PI} * (2 * ((l_suppkey % 1000) / CAST(1000 AS DOUBLE)) - 1)"),
        ],
        [
            ("px1", "pt1 * COS(phi1)"),
            ("py1", "pt1 * SIN(phi1)"),
            ("pz1", f"pt1 * {sinh_sql('eta1')}"),
            ("px2", "pt2 * COS(phi2)"),
            ("py2", "pt2 * SIN(phi2)"),
            ("pz2", f"pt2 * {sinh_sql('eta2')}"),
        ],
        [
            (
                "e1",
                f"SQRT(px1 * px1 + py1 * py1 + pz1 * pz1 + {MU_MASS} * {MU_MASS})",
            ),
            (
                "e2",
                f"SQRT(px2 * px2 + py2 * py2 + pz2 * pz2 + {MU_MASS} * {MU_MASS})",
            ),
        ],
        [
            ("qx", "px1 + px2"),
            ("qy", "py1 + py2"),
            ("qz", "pz1 + pz2"),
            ("qe", "e1 + e2"),
        ],
        [
            # p4_sum invariant mass (math_tools.py:5-26)
            ("mass", "SQRT(GREATEST(qe * qe - qx * qx - qy * qy - qz * qz, 0.0))"),
            ("qpt", "SQRT(qx * qx + qy * qy)"),
        ],
        [
            # rapidity (math_tools.py:29-35)
            ("rap", "0.5 * LN((qe + qz) / (qe - qz))"),
            # Collins-Soper cos(theta*) (math_tools.py:38-42 cs_variables)
            (
                "cos_cs",
                "((e1 + pz1) * (e2 - pz2) - (e1 - pz1) * (e2 + pz2))"
                " / (mass * SQRT(mass * mass + qpt * qpt))",
            ),
        ],
    ]


def apply_stages(df: DataFrame, stages: list[list[tuple[str, str]]]) -> DataFrame:
    """Fold staged definitions into the Spark plan via selectExpr — each
    stage's expressions may reference prior stages' aliases; Catalyst
    collapses the projections into one codegen'd stage."""
    for stage in stages:
        df = df.selectExpr("*", *[f"({expr}) AS {name}" for name, expr in stage])
    return df


def stages_to_sql(base_table: str, stages: list[list[tuple[str, str]]]) -> str:
    """Nested-subquery twin of :func:`apply_stages` for the oracle."""
    sql = base_table
    for stage in stages:
        cols = ", ".join(f"({expr}) AS {name}" for name, expr in stage)
        sql = f"(SELECT *, {cols} FROM {sql})"
    return sql
