"""Scalar transform functions — JVM-side Column builders.

Each reproduces one value-transform family from the reference (SURVEY.md
§2.7), compiled to Catalyst expressions (whole-stage codegen; no Python in
the hot path):

* F2  make_lang_dict_value  (general_configs.py:61-67)  -> lang_dict / lang_dict_json
* F5  GeoJSON point          (places.py:22-31)           -> geojson_point / geojson_point_json
* F7  concept-label normalize (groups.py:106-111)        -> normalize_label / label_lookup
* F8  name synthesis          (prov_acts.py:52-54)       -> synth_name
* F9  statement interpolation (places.py:62)             -> statement_text
* F12 default/constant columns (ref_collection.py:143-147) -> const_col
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def lang_dict(col: Column | str, lang: str = "en", direction: str = "ltr") -> Column:
    """Language-tagged value as a typed struct map: {lang: {value, direction}}."""
    return F.create_map(
        F.lit(lang),
        F.struct(_c(col).cast("string").alias("value"), F.lit(direction).alias("direction")),
    )


def lang_dict_json(col: Column | str, lang: str = "en", direction: str = "ltr") -> Column:
    """Same shape serialized as a JSON string, byte-stable (plain concat, so
    an ANSI-SQL oracle can reproduce it exactly with ``||``)."""
    return F.concat(
        F.lit('{"%s": {"value": "' % lang),
        _c(col).cast("string"),
        F.lit('", "direction": "%s"}}' % direction),
    )


def geojson_point(lon: Column | str, lat: Column | str) -> Column:
    """GeoJSON Point struct: {"type": "Point", "coordinates": [lon, lat]}."""
    return F.struct(
        F.lit("Point").alias("type"),
        F.array(_c(lon).cast("double"), _c(lat).cast("double")).alias("coordinates"),
    )


def valid_coord(col: Column | str) -> Column:
    """F6 NaN guard: a coordinate is usable iff non-null and non-NaN
    (reference np.isnan check before building the GeoJSON point,
    arches_rascoll/places.py:59)."""
    c = _c(col)
    return c.isNotNull() & ~F.isnan(c.cast("double"))


def geojson_point_safe(lon: Column | str, lat: Column | str) -> Column:
    """GeoJSON point struct, or null when either coordinate is null/NaN
    (the reference skips the geo field for such rows)."""
    return F.when(valid_coord(lon) & valid_coord(lat), geojson_point(lon, lat))


def geojson_point_json(lon: Column | str, lat: Column | str) -> Column:
    """GeoJSON Point as a byte-stable JSON string (oracle-reproducible)."""
    return F.concat(
        F.lit('{"type": "Point", "coordinates": ['),
        _c(lon).cast("double").cast("string"),
        F.lit(", "),
        _c(lat).cast("double").cast("string"),
        F.lit("]}"),
    )


def normalize_label(col: Column | str) -> Column:
    """Concept-label normalization: upper, trim, strip a trailing '.0'."""
    return F.regexp_replace(F.upper(F.trim(_c(col))), r"\.0$", "")


def label_lookup(col: Column | str, mapping: Mapping[str, str], default: str | None = None) -> Column:
    """Tiny-dimension lookup as a literal map (constant-folded; the
    broadcast-join formulation is operators side — J2)."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked = F.element_at(F.create_map(*pairs), normalize_label(col))
    return F.coalesce(looked, F.lit(default)) if default is not None else looked


def statement_text(name: Column | str, uri: Column | str) -> Column:
    """'NAME (URI: uri)' statement synthesis."""
    return F.format_string("%s (URI: %s)", _c(name).cast("string"), _c(uri).cast("string"))


def synth_name(prefix: str, col: Column | str) -> Column:
    """Prefix + cleaned identifier (strip whitespace and a trailing '.0')."""
    return F.concat(F.lit(prefix), F.regexp_replace(F.trim(_c(col).cast("string")), r"\.0$", ""))


def const_col(value, data_type: str = "string") -> Column:
    return F.lit(value).cast(data_type)


def any_present(*cols: Column | str) -> Column:
    """'Keep rows with ≥1 non-null value across a column set' (P4)."""
    return F.coalesce(*[_c(c) for c in cols]).isNotNull()


def ensure_json_array(col: Column | str) -> Column:
    """F13: wrap a JSON value in a one-element array unless it already IS
    an array (the reference's ``CASE jsonb_typeof(...) WHEN 'array'`` guard
    used when loading related-resource values,
    arches_rascoll/ref_collection.py:367-377 / data/etl_sql.txt:677-695).
    Null stays null — absent related resources load as absent."""
    c = _c(col)
    return F.when(c.isNull(), F.lit(None).cast("string")).when(
        F.trim(c).startswith("["), c
    ).otherwise(F.concat(F.lit("["), c, F.lit("]")))
