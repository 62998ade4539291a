"""DuckDB oracle for the flagship H->mumu pipeline query.

The registered builder (plans/physics.py:pipeline_hmm_histogram) runs
fixtures.events_fixture_distributed -> pipeline.stage1_arrays ->
pipeline.stage2_variations as one zero-shuffle-until-histogram Spark
plan.  This module re-derives the ENTIRE chain relationally in DuckDB
SQL — fixture generation from range(n) + the same integer-hash uniforms,
muon/jet explosion via LATERAL generate_series, selection, FSR index
dereference, charge-parity cut, top-2 via ROW_NUMBER, dR cleaning via
NOT EXISTS, pair kinematics, region/channel labels, the 3-variation
stack, and the fixed-point weighted histogram — so the showcase query is
full-value hash-checked against an INDEPENDENT execution strategy
(relational windows vs array higher-order functions).

Determinism notes (why the hash matches bit-for-bit):
- every fixture value is an integer-hash uniform through IEEE-exact
  +,-,*,/ and ROUND(x, 4); both engines agree on all of them;
- transcendentals (COS/SIN/EXP in the p4 math) may differ by 1 ulp
  between libm and the JVM, but the histogram sums are fixed-point
  (functions/exact.py) so sub-1e-6 wobble cannot surface;
- every non-integer SQL literal is CAST(... AS DOUBLE): DuckDB parses
  bare decimal literals as DECIMAL and computes exact decimal products
  (e.g. 0.9712 * 1.01) where Spark constant-folds the IEEE double
  product — a 1-ulp weight difference that flipped one sumw2 cell until
  the casts pinned both engines to double arithmetic.

Reference semantics mirrored: processor.py:146-318,471-478,561-667;
stage2/histogrammer.py:28-120 (see pipeline.py for the full map).
"""

from __future__ import annotations

HASH_P = 2147483647
TWO_PI = 6.283185307179586
PI = 3.141592653589793
MU_MASS = 0.105658


def u(salt: int, i: str | None = None) -> str:
    mixed = (salt * salt * 131 + salt) % HASH_P
    if i is None:
        ix = f"{mixed}"
    else:
        ix = f"({mixed} + CAST({i} AS BIGINT) * (1013904223 + (id % 65521)))"
    ev = f"(CAST(id AS BIGINT) % {HASH_P})"
    ixm = f"(CAST({ix} AS BIGINT) % {HASH_P})"
    h = f"(({ev} * 1013904223 + {ixm} * 1664525) % {HASH_P} + {HASH_P}) % {HASH_P}"
    return f"(CAST({h} AS DOUBLE) / {float(HASH_P)})"


def p4(pfx: str, pt: str, eta: str, phi: str, m2: str) -> dict[str, str]:
    px = f"({pt} * COS({phi}))"
    py = f"({pt} * SIN({phi}))"
    pz = f"({pt} * ((EXP({eta}) - EXP(-({eta}))) / 2))"
    e = f"(SQRT({px} * {px} + {py} * {py} + {pz} * {pz} + {m2}))"
    return {"px": px, "py": py, "pz": pz, "e": e}


def pair_mass(p1: dict[str, str], p2: dict[str, str]) -> str:
    qx = f"({p1['px']} + {p2['px']})"
    qy = f"({p1['py']} + {p2['py']})"
    qz = f"({p1['pz']} + {p2['pz']})"
    qe = f"({p1['e']} + {p2['e']})"
    return (
        f"(CASE WHEN {qe} IS NULL THEN CAST(NULL AS DOUBLE) ELSE "
        f"SQRT(GREATEST({qe} * {qe} - {qx} * {qx} - {qy} * {qy} - {qz} * {qz}, 0.0)) END)"
    )


MU_SF = ("CASE WHEN {pt} < 40 THEN CAST(0.9712 AS DOUBLE) "
         "WHEN {pt} < 80 THEN CAST(0.9905 AS DOUBLE) "
         "ELSE CAST(0.9951 AS DOUBLE) END")


def hmm_stage_ctes(n: int = 20000) -> str:
    """The fixture->stage1 CTE chain up to ``sel`` (labeled survivors
    with region/channel/dimuon_mass/wgt_* columns) WITHOUT the leading
    WITH keyword — shared by the flagship histogram oracle below and the
    r9 ROOT->TH1F e2e oracle (plans/sources.py), which append their own
    finishing CTEs."""
    u5 = u(5)
    n_mu = (
        f"CASE WHEN {u5} < 0.10 THEN 0 WHEN {u5} < 0.25 THEN 1 "
        f"WHEN {u5} < 0.85 THEN 2 WHEN {u5} < 0.95 THEN 3 ELSE 4 END"
    )
    dphi_jm = (
        f"((j.phi - m.phi) - {TWO_PI} * FLOOR(((j.phi - m.phi) + {PI}) / {TWO_PI}))"
    )
    dr2 = f"((j.eta - m.eta) * (j.eta - m.eta) + {dphi_jm} * {dphi_jm})"

    mu_m2 = f"{MU_MASS * MU_MASS}"
    mu1 = p4("", "mu1_pt", "mu1_eta", "mu1_phi", mu_m2)
    mu2 = p4("", "mu2_pt", "mu2_eta", "mu2_phi", mu_m2)
    dimuon_mass = pair_mass(mu1, mu2)
    j1 = p4("", "jet1_pt", "jet1_eta", "jet1_phi", "(jet1_mass) * (jet1_mass)")
    j2 = p4("", "jet2_pt", "jet2_eta", "jet2_phi", "(jet2_mass) * (jet2_mass)")
    jj_mass = pair_mass(j1, j2)

    def top2(field: str, pfx: str) -> str:
        return (
            f"MAX(CASE WHEN rn = 1 THEN {field} END) AS {pfx}1_{field},\n"
            f"       MAX(CASE WHEN rn = 2 THEN {field} END) AS {pfx}2_{field}"
        )

    sf1 = MU_SF.format(pt="mu1_pt")
    sf2 = MU_SF.format(pt="mu2_pt")

    return f"""
ev AS (
  SELECT id,
         {n_mu} AS n_mu,
         CAST(FLOOR({u(6)} * 3) AS INT) AS n_fsr,
         CAST(FLOOR({u(7)} * 6) AS INT) AS n_jet,
         ROUND((CASE WHEN {u(1)} < 0.05 THEN -1.0 ELSE 1.0 END) * (0.5 + {u(2)}), 4) AS genWeight
  FROM range({n}) t(id)
  WHERE ({u(3)} < 0.95) AND ({u(4)} < 0.98)
),
mu0 AS (
  SELECT id, n_fsr, i,
         ROUND(15 + 105 * {u(2001, 'i')}, 4) AS pt,
         ROUND(-2.6 + 5.2 * {u(2002, 'i')}, 4) AS eta,
         ROUND(-pi() + 2 * pi() * {u(2003, 'i')}, 4) AS phi,
         CASE WHEN {u(2004, 'i')} < 0.5 THEN -1 ELSE 1 END AS charge,
         ROUND(0.5 * {u(2005, 'i')}, 4) AS iso,
         ({u(2006, 'i')} < 0.9) AS mediumId,
         CASE WHEN n_fsr > 0
              THEN CAST(FLOOR({u(2007, 'i')} * (n_fsr + 1)) AS INT) - 1
              ELSE -1 END AS fsrIdx
  FROM ev, LATERAL (SELECT unnest(generate_series(1, ev.n_mu)) AS i) t
),
msel AS (
  SELECT id, i, eta, phi, charge,
         pt + (CASE WHEN fsrIdx >= 0
                    THEN ROUND(1 + 9 * {u(4001, '(fsrIdx + 1)')}, 4)
                    ELSE 0.0 END) * 0.1 AS pt_corr
  FROM mu0
  WHERE pt + (CASE WHEN fsrIdx >= 0
                   THEN ROUND(1 + 9 * {u(4001, '(fsrIdx + 1)')}, 4)
                   ELSE 0.0 END) * 0.1 > 20
    AND ABS(eta) < 2.4 AND iso < 0.25 AND mediumId
),
evsel AS (
  SELECT id FROM msel GROUP BY id
  HAVING COUNT(*) = 2 AND SUM(CASE WHEN charge < 0 THEN 1 ELSE 0 END) % 2 = 1
),
mur AS (
  SELECT m.id, m.pt_corr, m.eta, m.phi,
         ROW_NUMBER() OVER (PARTITION BY m.id ORDER BY m.pt_corr DESC, m.i ASC) AS rn
  FROM msel m JOIN evsel s ON m.id = s.id
),
mupair AS (
  SELECT id,
         MAX(CASE WHEN rn = 1 THEN pt_corr END) AS mu1_pt,
         MAX(CASE WHEN rn = 2 THEN pt_corr END) AS mu2_pt,
         MAX(CASE WHEN rn = 1 THEN eta END) AS mu1_eta,
         MAX(CASE WHEN rn = 2 THEN eta END) AS mu2_eta,
         MAX(CASE WHEN rn = 1 THEN phi END) AS mu1_phi,
         MAX(CASE WHEN rn = 2 THEN phi END) AS mu2_phi
  FROM mur GROUP BY id
),
jet0 AS (
  SELECT ev.id, i,
         ROUND(20 + 280 * {u(3001, 'i')}, 4) AS pt,
         ROUND(-4.7 + 9.4 * {u(3002, 'i')}, 4) AS eta,
         ROUND(-pi() + 2 * pi() * {u(3003, 'i')}, 4) AS phi,
         ROUND(5 + 35 * {u(3004, 'i')}, 4) AS mass,
         ([0, 2, 6])[CAST(FLOOR({u(3005, 'i')} * 3) AS INT) + 1] AS jetId
  FROM ev JOIN evsel USING (id),
       LATERAL (SELECT unnest(generate_series(1, ev.n_jet)) AS i) t
),
jclean AS (
  SELECT j.* FROM jet0 j
  WHERE j.pt > 25 AND ABS(j.eta) < 4.7 AND j.jetId >= 2
    AND NOT EXISTS (
      SELECT 1 FROM msel m WHERE m.id = j.id AND {dr2} < 0.16)
),
jcount AS (SELECT id, COUNT(*) AS njets FROM jclean GROUP BY id),
jr AS (
  SELECT j.*, ROW_NUMBER() OVER (PARTITION BY id ORDER BY pt DESC, i ASC) AS rn
  FROM jclean j
),
jpair AS (
  SELECT id,
         {top2("pt", "jet")},
         {top2("eta", "jet")},
         {top2("phi", "jet")},
         {top2("mass", "jet")}
  FROM jr GROUP BY id
),
flat AS (
  SELECT e.id, e.genWeight,
         mp.mu1_pt, mp.mu2_pt, mp.mu1_eta, mp.mu2_eta, mp.mu1_phi, mp.mu2_phi,
         COALESCE(jc.njets, 0) AS njets,
         jp.jet1_pt, jp.jet2_pt, jp.jet1_eta, jp.jet2_eta,
         jp.jet1_phi, jp.jet2_phi, jp.jet1_mass, jp.jet2_mass
  FROM ev e
  JOIN evsel USING (id)
  JOIN mupair mp USING (id)
  LEFT JOIN jcount jc USING (id)
  LEFT JOIN jpair jp USING (id)
),
kin AS (
  SELECT id, genWeight, njets, mu1_pt, mu2_pt,
         {dimuon_mass} AS dimuon_mass,
         {jj_mass} AS jj_mass
  FROM flat
),
labeled AS (
  SELECT *,
         CASE WHEN dimuon_mass > 76 AND dimuon_mass < 106 THEN 'z-peak'
              WHEN dimuon_mass >= 115 AND dimuon_mass < 135 THEN 'h-peak'
              WHEN (dimuon_mass >= 110 AND dimuon_mass < 115)
                OR (dimuon_mass >= 135 AND dimuon_mass < 150) THEN 'h-sidebands'
              ELSE 'none' END AS region,
         CASE WHEN njets >= 2 AND jj_mass > 400 THEN 'vbf'
              WHEN njets = 0 THEN 'ggh_0jets'
              WHEN njets = 1 THEN 'ggh_1jet'
              ELSE 'ggh_2orMoreJets' END AS channel,
         ((genWeight * ({sf1})) * ({sf2})) AS wgt_nominal,
         ((genWeight * (({sf1}) * CAST(1.01 AS DOUBLE))) * (({sf2}) * CAST(1.01 AS DOUBLE))) AS wgt_muid_up,
         ((genWeight * (({sf1}) * CAST(0.99 AS DOUBLE))) * (({sf2}) * CAST(0.99 AS DOUBLE))) AS wgt_muid_down
  FROM kin
),
sel AS (SELECT * FROM labeled WHERE region <> 'none')"""


def hmm_pipeline_oracle(n: int = 20000) -> str:
    from copperhead_spark.functions.exact import exact_sum_sql
    from copperhead_spark.operators.histogram import bin_index_sql

    return f"""
WITH {hmm_stage_ctes(n)},
stacked AS (
  SELECT region, channel, dimuon_mass, 'nominal' AS variation, wgt_nominal AS wgt FROM sel
  UNION ALL
  SELECT region, channel, dimuon_mass, 'muid_up', wgt_muid_up FROM sel
  UNION ALL
  SELECT region, channel, dimuon_mass, 'muid_down', wgt_muid_down FROM sel
)
SELECT region, channel, variation,
       {bin_index_sql("dimuon_mass", 76.0, 150.0, 37)} AS bin_idx,
       {exact_sum_sql("wgt", 6)} AS value,
       {exact_sum_sql("wgt * wgt", 12)} AS sumw2
FROM stacked
GROUP BY region, channel, variation, bin_idx
"""
