"""The copperhead pipeline, Spark-first: stage1 (event selection + object
corrections + pairing + wide derived projection), stage2 (categorize +
weighted histograms), stage3 (yields / templates on collected data).

This is the end-to-end parity surface: a reference user's three-script
workflow (run_stage1/2/3.py) maps onto three composable DataFrame
transformations.  Stage boundaries keep the reference's contract (stage1
output = flat wide table partitionable by dataset; stage2 output = the
histogram table of FIXTURES.md §F3) but each stage is ONE lazy plan — no
per-chunk Python loops, no pickled intermediate state.

Reference walk-through being mirrored (citations into /root/reference):
 - HLT/flag filter          processor.py:146-156,234-235
 - FSR recovery (idx join)  stage1/corrections/fsr_recovery.py:6-13
 - muon selection           processor.py:243-249
 - nmuons + opposite sign   processor.py:252-260
 - leading/subleading pair  processor.py:295-318
 - dimuon kinematics        stage1/muons.py:6-71; python/math_tools.py:5-42
 - jet selection + dR clean processor.py:561-577,634-641
 - njets / top-2 jets / jj  processor.py:649-667; stage1/jets.py:22-147
 - muon SF weights          stage1/corrections/lepton_sf.py; weights.py
 - region labels            processor.py:471-478
 - channel cascade          stage2/categorizer.py:1-23
 - histograms               stage2/histogrammer.py:28-120
 - yields/templates         stage3/make_templates.py:197-207
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from copperhead_spark.operators.aggregates import sign_product
from copperhead_spark.operators.barrier import codegen_barrier
from copperhead_spark.operators.histogram import histogram
from copperhead_spark.operators.jagged import (
    dr_clean_anti_join,
    explode_collection,
    top2_pivot,
    xref_join,
)

MU_MASS = 0.105658
TWO_PI = 6.283185307179586
PI = 3.141592653589793


def _p4(prefix: str, pt: str, eta: str, phi: str, mass: float | str) -> list[tuple[str, str]]:
    m2 = f"({mass}) * ({mass})" if isinstance(mass, str) else f"{mass * mass}"
    return [
        (f"{prefix}px", f"{pt} * COS({phi})"),
        (f"{prefix}py", f"{pt} * SIN({phi})"),
        (f"{prefix}pz", f"{pt} * ((EXP({eta}) - EXP(-({eta}))) / 2)"),
        (
            f"{prefix}e",
            f"SQRT({prefix}px * {prefix}px + {prefix}py * {prefix}py"
            f" + {prefix}pz * {prefix}pz + {m2})",
        ),
    ]


def _pair_kinematics(df: DataFrame, p1: str, p2: str, out: str, m1, m2) -> DataFrame:
    """Invariant mass / pt / rapidity / dEta / dPhi / dR of an object pair
    given {p}_pt/{p}_eta/{p}_phi columns."""
    stages = [
        _p4("_a_", f"{p1}pt", f"{p1}eta", f"{p1}phi", m1)
        + _p4("_b_", f"{p2}pt", f"{p2}eta", f"{p2}phi", m2),
        [
            ("_qx", "_a_px + _b_px"),
            ("_qy", "_a_py + _b_py"),
            ("_qz", "_a_pz + _b_pz"),
            ("_qe", "_a_e + _b_e"),
        ],
        [
            # explicit NULL guard: GREATEST skips NULLs, so NULL inputs
            # (absent second jet) would otherwise turn into mass = 0.0
            (
                f"{out}mass",
                "IF(_qe IS NULL, CAST(NULL AS DOUBLE), "
                "SQRT(GREATEST(_qe * _qe - _qx * _qx - _qy * _qy - _qz * _qz, 0.0)))",
            ),
            (f"{out}pt", "SQRT(_qx * _qx + _qy * _qy)"),
            (f"{out}rap", "0.5 * LN((_qe + _qz) / (_qe - _qz))"),
            (f"{out}dEta", f"{p1}eta - {p2}eta"),
            (
                f"{out}dPhi",
                f"(({p1}phi - {p2}phi) - {TWO_PI} * FLOOR((({p1}phi - {p2}phi) + {PI}) / {TWO_PI}))",
            ),
        ],
        [
            (
                f"{out}dR",
                f"SQRT({out}dEta * {out}dEta + {out}dPhi * {out}dPhi)",
            )
        ],
    ]
    for stage in stages:
        df = df.selectExpr("*", *[f"({e}) AS {n}" for n, e in stage])
    return df.drop(
        "_a_px", "_a_py", "_a_pz", "_a_e", "_b_px", "_b_py", "_b_pz", "_b_e",
        "_qx", "_qy", "_qz", "_qe",
    )


_MU_SF = (
    "CASE WHEN {pt} < 40 THEN 0.9712 WHEN {pt} < 80 THEN 0.9905 ELSE 0.9951 END"
)


def stage1(events: DataFrame) -> DataFrame:
    """Raw jagged events -> flat wide per-event table (one lazy plan)."""
    ev = events.filter(F.col("HLT_IsoMu24") & F.col("Flag_goodVertices"))

    # --- muons: explode -> FSR recovery -> selection -------------------
    muons = explode_collection(ev, "Muon")
    fsr = explode_collection(ev, "FsrPhoton")
    muons = xref_join(muons, fsr, "fsrPhotonIdx", ("pt",), prefix="fsr_")
    muons = muons.withColumn(
        "pt_corr", F.col("pt") + F.coalesce(F.col("fsr_pt"), F.lit(0.0)) * 0.1
    )
    sel_mu = muons.filter(
        (F.col("pt_corr") > 20)
        & (F.abs(F.col("eta")) < 2.4)
        & (F.col("pfRelIso04_all") < 0.25)
        & F.col("mediumId")
    )

    per_event = sel_mu.groupBy("event").agg(
        F.count("*").alias("nmuons"),
        sign_product(F.col("charge")).alias("mm_charge"),
    )

    pair = top2_pivot(
        sel_mu,
        order_by=[F.col("pt_corr").desc(), F.col("idx").asc()],
        fields=("pt_corr", "eta", "phi", "charge", "pfRelIso04_all"),
        prefixes=("mu1_", "mu2_"),
    ).withColumnRenamed("mu1_pt_corr", "mu1_pt").withColumnRenamed(
        "mu2_pt_corr", "mu2_pt"
    )

    # --- jets: selection + dR cleaning vs selected muons ---------------
    jets = explode_collection(ev, "Jet")
    sel_jet = jets.filter(
        (F.col("pt") > 25) & (F.abs(F.col("eta")) < 4.7) & (F.col("jetId") >= 2)
    )
    clean_jet = dr_clean_anti_join(sel_jet, sel_mu.select("event", "eta", "phi"), 0.4)
    jet_counts = clean_jet.groupBy("event").agg(F.count("*").alias("njets"))
    jet_pair = top2_pivot(
        clean_jet,
        order_by=[F.col("pt").desc(), F.col("idx").asc()],
        fields=("pt", "eta", "phi", "mass", "qgl"),
        prefixes=("jet1_", "jet2_"),
        require=1,
    )

    # --- assemble the event table --------------------------------------
    flat = (
        ev.select("event", "run", "genWeight", "MET_pt", "Pileup_nTrueInt")
        .join(per_event, "event")
        .join(pair, "event")
        .filter((F.col("nmuons") == 2) & (F.col("mm_charge") == -1))
        .join(jet_counts, "event", "left")
        .join(jet_pair, "event", "left")
        .withColumn("njets", F.coalesce(F.col("njets"), F.lit(0)))
    )

    return _derive_and_label(flat)


def _derive_and_label(flat: DataFrame) -> DataFrame:
    """Shared stage-1 tail: pair kinematics, region labels, weight ledger
    (identical for the exploded-child and array-native front halves).

    The codegen_barrier is load-bearing: fused with the array-native
    front half, this tail's kinematics push the single whole-stage span
    past janino's 64 KB method limit and the ENTIRE pipeline silently
    ran interpreted (discovered r8 by the fallback=false preflight gate;
    see operators/barrier.codegen_barrier).  Splitting here keeps both
    spans compiled."""
    flat = codegen_barrier(flat, "cgb_derive")
    flat = _pair_kinematics(flat, "mu1_", "mu2_", "dimuon_", MU_MASS, MU_MASS)
    flat = _pair_kinematics_jets(flat)

    region = (
        F.when((F.col("dimuon_mass") > 76) & (F.col("dimuon_mass") < 106), "z-peak")
        .when((F.col("dimuon_mass") >= 115) & (F.col("dimuon_mass") < 135), "h-peak")
        .when(
            ((F.col("dimuon_mass") >= 110) & (F.col("dimuon_mass") < 115))
            | ((F.col("dimuon_mass") >= 135) & (F.col("dimuon_mass") < 150)),
            "h-sidebands",
        )
        .otherwise("none")
    )
    wgt = (
        F.col("genWeight")
        * F.expr(_MU_SF.format(pt="mu1_pt"))
        * F.expr(_MU_SF.format(pt="mu2_pt"))
    )
    # systematic variations: SF coherently shifted +/-1% per muon
    # (lepton_sf.py up/down errs; weights.py:37-47 'all' semantics)
    wgt_up = (
        F.col("genWeight")
        * (F.expr(_MU_SF.format(pt="mu1_pt")) * 1.01)
        * (F.expr(_MU_SF.format(pt="mu2_pt")) * 1.01)
    )
    wgt_down = (
        F.col("genWeight")
        * (F.expr(_MU_SF.format(pt="mu1_pt")) * 0.99)
        * (F.expr(_MU_SF.format(pt="mu2_pt")) * 0.99)
    )
    return (
        flat.withColumn("region", region)
        .filter(F.col("region") != "none")
        .withColumn("wgt_nominal", wgt)
        .withColumn("wgt_muid_up", wgt_up)
        .withColumn("wgt_muid_down", wgt_down)
    )


def _once(df: DataFrame, *exprs: str) -> DataFrame:
    """Shuffle-free optimizer barrier (operators/barrier.py): without it
    CollapseProject re-inlines the array chains into every referencing
    column (measured: 898 copies of one array_sort in this plan)."""
    from copperhead_spark.operators.barrier import project_once

    return project_once(df, *exprs)


def stage1_arrays(events: DataFrame) -> DataFrame:
    """stage1 with ZERO shuffles: every jagged operation — FSR index
    dereference, object selection, charge product, pt-ordered top-2,
    dR cleaning against selected muons — runs as array higher-order
    functions on the array-of-struct columns, entirely inside
    whole-stage codegen.  Same results as stage1() (asserted in
    tests/test_pipeline.py); the exploded-child operators remain the
    general path when children outgrow single-row arrays, but for
    NanoAOD-shaped multiplicities (<= tens of objects/event) the
    array-native plan turns stage 1 from ~13 event-key shuffles into a
    pure map — at 100 TB that is the difference between a network-bound
    and a scan-bound job (only stage 2's histogram shuffles)."""
    ev = events.filter(F.col("HLT_IsoMu24") & F.col("Flag_goodVertices"))

    dphi = "((({a}) - ({b})) - {tp} * FLOOR(((({a}) - ({b})) + {p}) / {tp}))"
    dphi_jm = dphi.format(a="j.phi", b="m.phi", tp=TWO_PI, p=PI)
    dr2 = f"((j.eta - m.eta) * (j.eta - m.eta) + {dphi_jm} * {dphi_jm})"
    by_pt = (
        "(a, b) -> CASE WHEN a.{pt} > b.{pt} THEN -1 WHEN a.{pt} < b.{pt} THEN 1 "
        "WHEN a.idx < b.idx THEN -1 WHEN a.idx > b.idx THEN 1 ELSE 0 END"
    )

    base = ["event", "run", "genWeight", "MET_pt", "Pileup_nTrueInt"]

    # FSR recovery (fsr_recovery.py:6-13) as an index dereference instead
    # of the (event, idx) equi-join on exploded children; then the full
    # muon selection (processor.py:243-249) as an array filter.
    # r12 reorder: the raw-field cuts (eta / iso / mediumId) run FIRST,
    # so the FSR dereference + struct build only touch surviving muons
    # (array HOFs are interpreted expressions — per-element work is the
    # cost driver).  Exact-equivalent: those cuts read fields the
    # transform does not change, filter() preserves element order so the
    # idx tiebreak ranks identically, and fsrPhotonIdx indexes the
    # UNfiltered FsrPhoton array.  mediumId is consumed by the filter
    # and dropped from the struct (nothing downstream reads it).
    stage_a = _once(
        ev,
        *base,
        "Jet",
        """filter(
             transform(
               filter(Muon, m -> abs(m.eta) < 2.4
                             AND m.pfRelIso04_all < 0.25 AND m.mediumId),
               (m, i) -> struct(
                 m.pt + coalesce(IF(m.fsrPhotonIdx >= 0,
                                    try_element_at(FsrPhoton, m.fsrPhotonIdx + 1).pt,
                                    CAST(NULL AS DOUBLE)), 0.0) * 0.1 AS pt_corr,
                 m.eta AS eta, m.phi AS phi, m.charge AS charge,
                 m.pfRelIso04_all AS pfRelIso04_all,
                 i AS idx)),
             m -> m.pt_corr > 20)
        """.replace("\n", " ")
        + " AS mu_sel",
    )

    # the two-muon opposite-sign cut (exact +/-1 product = parity of
    # negatives, processor.py:260) drops ~95% of events BEFORE any
    # sorting or jet work
    selected = stage_a.filter(
        F.expr(
            "size(mu_sel) = 2 AND "
            "aggregate(mu_sel, 0, (acc, m) -> acc + IF(m.charge < 0, 1, 0)) % 2 = 1"
        )
    )

    stage_b = _once(
        selected,
        *base,
        "CAST(size(mu_sel) AS BIGINT) AS nmuons",
        "-1 AS mm_charge",
        f"array_sort(mu_sel, {by_pt.format(pt='pt_corr')}) AS mu_sorted",
        # jet selection + dR cleaning vs the SELECTED muons
        # (processor.py:561-577,634-641): quantified NOT EXISTS as a
        # nested array predicate.  r12 reorder (same rationale and
        # equivalence argument as the muon block): raw-field cuts first,
        # struct build only for survivors; jetId is filter-only and
        # dropped from the struct.
        f"""filter(
              transform(
                filter(Jet, j -> j.pt > 25 AND abs(j.eta) < 4.7
                              AND j.jetId >= 2),
                (j, i) -> struct(
                       j.pt AS pt, j.eta AS eta, j.phi AS phi,
                       j.mass AS mass, j.qgl AS qgl,
                       i AS idx)),
              j -> NOT exists(mu_sel, m -> {dr2} < 0.16))
         """.replace("\n", " ")
        + " AS jet_clean",
    )

    stage_c = _once(
        stage_b,
        *base,
        "nmuons",
        "mm_charge",
        "mu_sorted",
        "CAST(size(jet_clean) AS BIGINT) AS njets",
        f"array_sort(jet_clean, {by_pt.format(pt='pt')}) AS jet_sorted",
    )

    def _obj(src: str, n: int, prefix: str, fields: list[tuple[str, str]]) -> list[str]:
        return [
            f"try_element_at({src}, {n}).{f} AS {prefix}{alias}" for f, alias in fields
        ]

    mu_fields = [
        ("pt_corr", "pt"), ("eta", "eta"), ("phi", "phi"),
        ("charge", "charge"), ("pfRelIso04_all", "pfRelIso04_all"),
    ]
    jet_fields = [
        ("pt", "pt"), ("eta", "eta"), ("phi", "phi"),
        ("mass", "mass"), ("qgl", "qgl"),
    ]
    flat = stage_c.selectExpr(
        *base,
        "nmuons",
        "mm_charge",
        *_obj("mu_sorted", 1, "mu1_", mu_fields),
        *_obj("mu_sorted", 2, "mu2_", mu_fields),
        "njets",
        *_obj("jet_sorted", 1, "jet1_", jet_fields),
        *_obj("jet_sorted", 2, "jet2_", jet_fields),
    )
    return _derive_and_label(flat)


def _pair_kinematics_jets(flat: DataFrame) -> DataFrame:
    """jj system for events with >= 2 clean jets; NULL otherwise (the
    reference's NaN-for-missing-jets semantics, FIXTURES.md §F2).
    Single pass: NULL jet2 inputs propagate to NULL jj_* columns through
    the arithmetic itself (no filter/union split — that would execute the
    whole upstream plan twice)."""
    return _pair_kinematics(flat, "jet1_", "jet2_", "jj_", "jet1_mass", "jet2_mass")


def channel_case():
    """The ordered channel cascade (stage2/categorizer.py:1-23) as one
    CASE expression — shared by stage2, stage2_variations and the
    stage-3 anchor aggregates so the label logic exists exactly once."""
    return (
        F.when((F.col("njets") >= 2) & (F.col("jj_mass") > 400), "vbf")
        .when(F.col("njets") == 0, "ggh_0jets")
        .when(F.col("njets") == 1, "ggh_1jet")
        .otherwise("ggh_2orMoreJets")
    )


def stage2(
    flat: DataFrame,
    var: str = "dimuon_mass",
    lo: float = 76.0,
    hi: float = 150.0,
    nbins: int = 37,
) -> DataFrame:
    """Categorize + weighted histogram: one groupBy replaces the
    region x channel x variation fill loops (histogrammer.py:56-120)."""
    categorized = flat.withColumn("channel", channel_case())
    return histogram(
        categorized,
        value=F.col(var),
        lo=lo,
        hi=hi,
        nbins=nbins,
        by=["region", "channel"],
        weight=F.col("wgt_nominal"),
        scale=6,
    )


def stage2_variations(
    flat: DataFrame,
    var: str = "dimuon_mass",
    lo: float = 76.0,
    hi: float = 150.0,
    nbins: int = 37,
    variations: tuple[str, ...] = ("nominal", "muid_up", "muid_down"),
) -> DataFrame:
    """Full stage-2 shape with the systematic-variation axis: variation
    columns are UNPIVOTed (stack) into rows and everything aggregates in
    ONE shuffle — the reference's region x channel x variation Python fill
    loops (histogrammer.py:56-120) become a fourth grouping key."""
    stack_args = ", ".join(f"'{v}', wgt_{v}" for v in variations)
    stacked = flat.withColumn("channel", channel_case()).selectExpr(
        "region",
        "channel",
        var,
        f"stack({len(variations)}, {stack_args}) AS (variation, wgt)",
    )
    return histogram(
        stacked,
        value=F.col(var),
        lo=lo,
        hi=hi,
        nbins=nbins,
        by=["region", "channel", "variation"],
        weight=F.col("wgt"),
        scale=6,
    )


def stage2_unbinned(flat: DataFrame, columns: tuple[str, ...] = ("dimuon_mass", "wgt_nominal")) -> DataFrame:
    """Unbinned column save for driver-side fits (postprocessor.py:
    235-253; FIXTURES.md §F3.1): the selected columns only — the fit
    consumes O(selected events), never the wide table."""
    return flat.select(*columns)


def stage3(hist: DataFrame):
    """Driver-side finishing on the (tiny) aggregate table: yields per
    (region, channel) + a template dict per category — the collected-data
    analogue of make_templates.py:197-207 / make_datacards.py."""
    import pandas as pd  # noqa: F401

    yields = (
        hist.groupBy("region", "channel")
        .agg(F.sum("value").alias("yield"), F.sum("sumw2").alias("sumw2"))
        .toPandas()
        .sort_values(["region", "channel"])
        .reset_index(drop=True)
    )
    bins = hist.toPandas()
    templates = {
        (r, c): g.sort_values("bin_idx")[["bin_idx", "value", "sumw2"]].to_numpy()
        for (r, c), g in bins.groupby(["region", "channel"])
    }
    return yields, templates
