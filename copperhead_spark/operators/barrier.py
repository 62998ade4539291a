"""Shuffle-free optimizer barrier.

CollapseProject merges adjacent projections and re-inlines an expensive
expression into EVERY downstream column that references it — a signature
array extracted into K columns recomputes the signature K times; the
array-native stage1's sort chains exploded to 898 copies of one
array_sort.  A `repartition()` stops the collapse but costs a full
shuffle.  `inline(array(struct(...)))` is a Generate node: CollapseProject
cannot merge through it, the generator expressions evaluate exactly once
per row, and no exchange is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def project_once(df: DataFrame, *exprs: str) -> DataFrame:
    """Project ``exprs`` (SQL snippets, each aliased or a plain column
    name) so each is evaluated exactly once per row and downstream
    references see plain attributes."""
    return df.selectExpr(f"inline(array(struct({', '.join(exprs)})))")
