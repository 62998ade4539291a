"""Jagged (array-of-struct) collection helpers — the event-data layer
(SURVEY.md §1.1, §7 step 3).

The reference's data model is one row per event with variable-length
object collections (Muon, Jet, ...) as awkward arrays; ops are
ak.flatten/ak.num/ak.cartesian and index cross-references
(/root/reference/stage1/processor.py:168-171,334-335; config/branches.py).

Spark mapping: collections are ``ArrayType(StructType)`` columns;
normalization is ``posexplode`` into child tables keyed (event, idx);
re-nesting is sorted ``collect_list(struct)``.  At 100 TB, explode the
*pruned* collection (filter inside the array first with HOFs when the
predicate is per-object) and keep event-keyed operations co-partitioned:
one `repartition(event)` early is reused by every groupBy/join that
follows (exchange reuse)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_collection(
    events: DataFrame,
    collection: str,
    event_col: str = "event",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """ak.to_pandas flattening (processor.py:211-224): one row per object,
    keyed (event, idx).  posexplode keeps the intra-event index — the
    cross-reference key for J1-style idx joins."""
    cols = [F.col(event_col), *[F.col(c) for c in keep]]
    return events.select(
        *cols, F.posexplode(F.col(collection)).alias("idx", "_obj")
    ).select(*[c for c in [event_col, *keep]], "idx", "_obj.*")


def collection_counts(
    events: DataFrame, collection: str, pred: str | None = None
) -> Column:
    """ak.num / ak.count (processor.py:252-257): per-event object count,
    optionally of objects passing a per-object predicate — computed with
    array HOFs, no explode, no shuffle."""
    if pred is None:
        return F.size(F.col(collection))
    return F.size(F.filter(F.col(collection), lambda x: F.expr(pred.format(x="x"))))


def filter_collection(collection: Column, pred) -> Column:
    """Object selection inside the array (muon cuts before any explode):
    `pred` is a Column-lambda over the struct element."""
    return F.filter(collection, pred)


def nest_collection(
    child: DataFrame,
    fields: tuple[str, ...],
    event_col: str = "event",
    idx_col: str = "idx",
    out_col: str = "objs",
) -> DataFrame:
    """Inverse of explode: re-nest a child table into a sorted
    array-of-struct (ak.unflatten).  Sorting by idx inside array_sort
    makes the result deterministic regardless of shuffle order."""
    struct = F.struct(F.col(idx_col).alias("idx"), *[F.col(f) for f in fields])
    return child.groupBy(event_col).agg(
        F.array_sort(F.collect_list(struct)).alias(out_col)
    )


def xref_join(
    child: DataFrame,
    target: DataFrame,
    idx_field: str,
    target_fields: tuple[str, ...],
    event_col: str = "event",
    prefix: str = "matched_",
) -> DataFrame:
    """Index cross-reference join (J1: Muon_fsrPhotonIdx -> FsrPhoton,
    fsr_recovery.py:6-13; NanoAODSchema `matched_*` virtual joins):
    left join child.idx_field == target.idx within the same event;
    idx < 0 means no match (NanoAOD convention) and yields nulls."""
    t = target.select(
        F.col(event_col).alias("_t_event"),
        F.col("idx").alias("_t_idx"),
        *[F.col(f).alias(f"{prefix}{f}") for f in target_fields],
    )
    return child.join(
        t,
        (F.col(event_col) == F.col("_t_event")) & (F.col(idx_field) == F.col("_t_idx")),
        "left",
    ).drop("_t_event", "_t_idx")


def dr_clean_anti_join(
    objs: DataFrame,
    cleaners: DataFrame,
    dr_max: float,
    event_col: str = "event",
    eta: str = "eta",
    phi: str = "phi",
) -> DataFrame:
    """DR-cleaning anti-join (J2, processor.py:561-577): drop objects
    having any cleaner within dR < dr_max in the same event.  Equi-join
    on the event key + dR predicate — linear per event, never a global
    nested loop; AQE splits skewed events."""
    c = cleaners.select(
        F.col(event_col).alias("_c_event"),
        F.col(eta).alias("_c_eta"),
        F.col(phi).alias("_c_phi"),
    )
    deta = F.col(eta) - F.col("_c_eta")
    dphi_raw = F.col(phi) - F.col("_c_phi")
    two_pi = 6.283185307179586
    dphi = dphi_raw - two_pi * F.floor((dphi_raw + 3.141592653589793) / two_pi)
    dr2 = deta * deta + dphi * dphi
    cond = (F.col(event_col) == F.col("_c_event")) & (dr2 < dr_max * dr_max)
    return objs.join(c, cond, "left_anti")


def top2_pivot(
    child: DataFrame,
    order_by: list[Column],
    fields: tuple[str, ...],
    event_col: str = "event",
    prefixes: tuple[str, str] = ("o1_", "o2_"),
    require: int = 2,
) -> DataFrame:
    """Leading/subleading pivot (J4, processor.py:295-318): rank objects
    per event, keep rn in (1,2), pivot to one wide row via conditional
    aggregation.  Events with fewer than ``require`` objects are dropped;
    with require=1, subleading fields are NULL when absent (the
    reference's jet1-without-jet2 NaN semantics, processor.py:663-667)."""
    from pyspark.sql import Window

    w = Window.partitionBy(event_col).orderBy(*order_by)
    ranked = child.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 2)
    aggs = []
    for rn, prefix in ((1, prefixes[0]), (2, prefixes[1])):
        for f in fields:
            aggs.append(
                F.max(F.when(F.col("_rn") == rn, F.col(f))).alias(f"{prefix}{f}")
            )
    return (
        ranked.groupBy(event_col)
        .agg(*aggs, F.count("*").alias("_n"))
        .filter(F.col("_n") >= require)
        .drop("_n")
    )
