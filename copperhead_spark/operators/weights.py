"""Weight ledger: the reference's ``Weights`` accumulator as pure column
expressions (SURVEY.md §2.10 F5).

The reference maintains a running per-event product ``nominal`` plus
``{name}_up/_down/_off`` systematic-variation columns
(/root/reference/stage1/weights.py:5-71): ``add_weight(name, w, how)``
with how ∈ {nom, all, only_vars, dummy*}.  There is nothing aggregate
about it — it's column arithmetic — so the Spark version is an expression
builder: no UDF, no shuffle, stays inside whole-stage codegen.

Variation semantics (weights.py:37-60): the varied total for weight k is
``nominal / w_k * w_k_var`` — i.e., replace one factor, keep the rest.
Division is avoided (w_k can be 0) by tracking each factor and rebuilding
products lazily.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class WeightsLedger:
    """Accumulates multiplicative per-row weights and emits the nominal
    product plus one varied product per registered variation."""

    _factors: list[tuple[str, Column]] = field(default_factory=list)
    _variations: dict[str, Column] = field(default_factory=dict)
    # names registered via add_variation_only: dispatch is recorded, not
    # inferred — a '{factor}_suffix'-shaped only_vars name must still
    # multiply the FULL nominal, never replace the factor
    _only_vars: set[str] = field(default_factory=set)

    def add_weight(self, name: str, w: Column) -> "WeightsLedger":
        """how='nom': multiply into nominal only (weights.py:48-54)."""
        self._factors.append((name, w))
        return self

    def add_weight_with_variations(
        self, name: str, w: Column, up: Column, down: Column
    ) -> "WeightsLedger":
        """how='all': nominal factor + up/down variations
        (weights.py:37-47)."""
        self._factors.append((name, w))
        self._variations[f"{name}_up"] = up
        self._variations[f"{name}_down"] = down
        return self

    def add_variation_only(self, name: str, var: Column) -> "WeightsLedger":
        """how='only_vars': variation without touching nominal
        (weights.py:55-60)."""
        self._variations[name] = var
        self._only_vars.add(name)
        return self

    def nominal(self) -> Column:
        out = F.lit(1.0)
        for _, w in self._factors:
            out = out * w
        return out

    def varied(self, variation: str) -> Column:
        """Product with the named factor replaced by its variation.

        ``variation`` is '{name}_up' / '{name}_down' / a bare only_vars
        name; factors not owning the variation contribute their nominal."""
        var_col = self._variations[variation]
        if variation in self._only_vars:
            # only_vars: variation multiplies the full nominal — decided
            # by REGISTRATION, not by parsing the name (an only_vars
            # variation named '{factor}_up' must not replace the factor)
            return self.nominal() * var_col
        base = variation.rsplit("_", 1)[0]
        owned = {n for n, _ in self._factors}
        if base not in owned:
            return self.nominal() * var_col
        out = F.lit(1.0)
        for n, w in self._factors:
            out = out * (var_col if n == base else w)
        return out

    def with_columns(self, df: DataFrame, prefix: str = "wgt") -> DataFrame:
        """Attach wgt_nominal + all variation columns (the stage-1 output
        naming `wgt_{name}_{up,down}`, processor.py:482-488)."""
        df = df.withColumn(f"{prefix}_nominal", self.nominal())
        for v in self._variations:
            df = df.withColumn(f"{prefix}_{v}", self.varied(v))
        return df
