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

A ``FieldMapping`` additionally carries the reference's per-mapping tile
constructs, all compiled to byte-stable JSON-text Column expressions
(plain concat — an ANSI-SQL oracle reproduces every byte):

  * related      — RelatedResource entries building the
                   ``{resourceId, ontologyProperty, resourceXresourceId,
                   inverseOntologyProperty}`` JSON objects
                   (ref_collection.py:148-184): single-value entries
                   produce a dict keyed by the minted resourceXresourceId,
                   ``multi_value`` entries sharing a target accumulate into
                   a JSON array; the minted id is DETERMINISTIC
                   (sha_uuid over row key + target uuid + rel type) where
                   the reference used uuid4 — replay/retry idempotent.
  * tile_data    — (node_uuid, value) pairs expanded to a JSON document
                   (ref_collection.py:185-195); value is None, a list of
                   uuid strings, or ``TILE_DATA_COPY`` which embeds the
                   mapping's own transformed value
                   (general_configs.py:46,72-93 sentinel).
  * tile_other   — TileOtherField extra columns with their own transforms,
                   written only when BOTH the mapping source and their own
                   source are present (ref_collection.py:114-129).

All three are gated on the mapping source being non-null, mirroring the
reference's per-mapping null skip (ref_collection.py:106).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.hashing import deterministic_uuid, sha_uuid
from ..operators.lww import lww_latest

# Sentinel: a tile_data value that copies the mapping's transformed field
# value into the tile document (the reference's TILE_DATA_COPY_FLAG,
# general_configs.py:46).
TILE_DATA_COPY = "----COPY:stage_targ_field----"

# transforms whose output is already JSON text: embedded raw into composed
# JSON documents; everything else is embedded as a quoted JSON string
_JSON_TRANSFORMS = {"lang_dict_json", "to_json"}

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
class TileOtherField:
    """Extra tile column attached to a mapping (reference
    tile_other_fields, ref_collection.py:114-129)."""

    source: str
    target: str
    transform: str = "copy"
    cast: str | None = None


@dataclass(frozen=True)
class RelatedResource:
    """One related-resources entry (reference related_resources configs,
    general_configs.py:322-331 and ref_collection.py:148-184).

    ``source_uuid`` is the column holding the UUID of the resource being
    linked TO; entries with the same ``target`` compose into one output
    column (dict for single-value, array for multi_value — the reference's
    two shapes)."""

    source_uuid: str
    rel_type_id: str
    inverse_rel_type_id: str
    target: str = "related_objs"
    multi_value: bool = False


@dataclass(frozen=True)
class FieldMapping:
    source: str
    target: str
    transform: str = "copy"
    cast: str | None = None
    tile_other: tuple[TileOtherField, ...] = ()
    related: tuple[RelatedResource, ...] = ()
    tile_data: tuple[tuple[str, Any], ...] = ()
    tile_data_target: str = ""  # default: f"{target}_tile_data"

    def compile(self) -> Column:
        col = self._value()
        return col.alias(self.target)

    def _value(self) -> Column:
        col = TRANSFORMS[self.transform](F.col(self.source))
        if self.cast:
            col = col.cast(self.cast)
        return col

    def _value_json(self) -> Column:
        """The transformed value embedded into a JSON document: raw when
        the transform already yields JSON text, quoted otherwise. (Plain
        quote-wrap assumes values without embedded quotes — same contract
        as the byte-stable oracle JSON throughout queries.py.)"""
        v = self._value()
        if self.transform in _JSON_TRANSFORMS:
            return v
        return F.concat(F.lit('"'), v.cast("string"), F.lit('"'))

    def compile_extras(self, key_cols: tuple[str, ...]) -> list[Column]:
        """Tile-other columns, related-resources JSON columns, and the
        tile_data JSON column — all gated on the mapping source."""
        out: list[Column] = []
        ok = F.col(self.source).isNotNull()

        for of in self.tile_other:
            c = TRANSFORMS[of.transform](F.col(of.source))
            if of.cast:
                c = c.cast(of.cast)
            out.append(F.when(ok & F.col(of.source).isNotNull(), c).alias(of.target))

        groups: dict[str, list[RelatedResource]] = {}
        for r in self.related:
            groups.setdefault(r.target, []).append(r)
        for target, rels in groups.items():
            multi = rels[0].multi_value
            entries: list[Column] = []
            for r in rels:
                rid = F.col(r.source_uuid).cast("string")
                present = (
                    ok & rid.isNotNull() & (rid != "") & (rid != "NaN")
                )
                # deterministic resourceXresourceId (reference minted
                # uuid4 here, ref_collection.py:167 — nondeterministic;
                # sha_uuid makes replay/retry idempotent AND lets the
                # DuckDB oracle mint the identical id). The target field
                # name participates so two fields linking the same
                # resource mint distinct relationship ids.
                rx = sha_uuid(
                    *key_cols, F.lit(target), F.col(r.source_uuid), F.lit(r.rel_type_id)
                )
                obj = F.concat(
                    F.lit('{"resourceId": "'),
                    rid,
                    F.lit('", "ontologyProperty": "' + r.rel_type_id + '", "resourceXresourceId": "'),
                    rx,
                    F.lit('", "inverseOntologyProperty": "' + r.inverse_rel_type_id + '"}'),
                )
                if not multi:
                    obj = F.concat(F.lit('"'), rx, F.lit('": '), obj)
                entries.append(F.when(present, obj))
            wrapped = F.concat(
                F.lit("[" if multi else "{"),
                F.concat_ws(", ", *entries),  # concat_ws skips absent entries
                F.lit("]" if multi else "}"),
            )
            any_present = F.coalesce(*entries).isNotNull() if len(entries) > 1 else entries[0].isNotNull()
            out.append(F.when(any_present, wrapped).alias(target))

        if self.tile_data:
            parts: list[Column] = []
            for node, val in self.tile_data:
                if val == TILE_DATA_COPY:
                    body = self._value_json()
                elif val is None:
                    body = F.lit("null")
                elif isinstance(val, (list, tuple)):
                    body = F.lit(json.dumps(list(val)))
                else:
                    body = F.lit(json.dumps(val))
                parts.append(F.concat(F.lit(f'"{node}": '), body))
            doc = F.concat(F.lit("{"), F.concat_ws(", ", *parts), F.lit("}"))
            out.append(F.when(ok, doc).alias(self.tile_data_target or f"{self.target}_tile_data"))
        return out


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
        cols += [c for m in self.fields for c in m.compile_extras(self.key)]
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
