"""Declarative mapping spec → Spark plan compiler.

The reference drives a per-row Python loop from dict configs
(``raw_col → (targ_table, targ_field, data_type, value_transform,
default_values, …)``, arches_rascoll/general_configs.py:98-943, executed by
prep_transformed_data, ref_collection.py:88-198). Here the same *idea* —
transformation as data, not code — compiles to Column expressions, so
Catalyst sees one declarative plan: pushdown, pruning and codegen all apply,
and there is no row-at-a-time Python anywhere.

A ``MappingSpec`` describes one target table:
  * key          — primary-key column(s) (reference: raw_pk_col)
  * fields       — FieldMapping(source → target, named transform, cast)
  * constants    — default/constant columns (reference: default_values)
  * minted_ids   — deterministic UUIDv5 columns from key parts (replaces
                   the reference's uuid4 tile/resource minting)
  * require_any  — keep rows with ≥1 non-null among these sources
                   (reference: the OR-accumulated any-value check)
  * lww_order    — optional (order_cols): collapse duplicate keys LWW
                   (reference: dict_rows overwrite, ref_collection.py:95-97)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.hashing import deterministic_uuid
from ..operators.lww import lww_latest

# named transforms: string -> Column -> Column (extensible registry)
TRANSFORMS: dict[str, Callable[[Column], Column]] = {
    "copy": lambda c: c,
    "lang_dict": TX.lang_dict,
    "lang_dict_json": TX.lang_dict_json,
    "normalize_label": TX.normalize_label,
    "upper": F.upper,
    "trim": F.trim,
    "to_json": F.to_json,
    "sha256": lambda c: F.sha2(c.cast("string"), 256),
}


@dataclass(frozen=True)
class FieldMapping:
    source: str
    target: str
    transform: str = "copy"
    cast: str | None = None

    def compile(self) -> Column:
        col = TRANSFORMS[self.transform](F.col(self.source))
        if self.cast:
            col = col.cast(self.cast)
        return col.alias(self.target)


@dataclass(frozen=True)
class MappingSpec:
    name: str
    key: tuple[str, ...]
    fields: tuple[FieldMapping, ...]
    constants: dict[str, Any] = dc_field(default_factory=dict)
    minted_ids: dict[str, tuple[str, ...]] = dc_field(default_factory=dict)
    require_any: tuple[str, ...] = ()
    lww_order: tuple[str, ...] = ()

    def compile(self, df: DataFrame) -> DataFrame:
        """Compile the spec against a source DataFrame into a plan."""
        if self.require_any:
            df = df.where(TX.any_present(*self.require_any))
        cols: list[Column] = [F.col(k) for k in self.key]
        if self.lww_order:
            cols += [F.col(c) for c in self.lww_order if c not in self.key]
        cols += [m.compile() for m in self.fields]
        cols += [F.lit(v).alias(k) for k, v in self.constants.items()]
        cols += [
            deterministic_uuid(*parts).alias(target)
            for target, parts in self.minted_ids.items()
        ]
        out = df.select(*cols)
        if self.lww_order:
            out = lww_latest(out, list(self.key), list(self.lww_order))
            out = out.drop(*[c for c in self.lww_order if c not in {m.target for m in self.fields} and c not in self.key])
        return out
