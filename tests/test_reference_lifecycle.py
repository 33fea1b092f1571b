"""Reference-lifecycle parity: raw wide table → entity extraction → mapped
staging → ordered idempotent loads, end to end.

Mirrors the reference's pipeline shape (SURVEY.md §3.3: places → items with
cross-table minted-UUID joins, then idempotent staged apply in order —
instances before tiles, arches_rascoll README.md:41-42) on the engine:
MappingSpec-compiled plans, deterministic UUIDv5 minting, broadcast dim
join, LWW dedup, SnapshotTable idempotent merges. A user of the reference
could run this exact shape at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.functions.hashing import deterministic_uuid
from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.operators.lww import lww_latest
from arches_rascoll_etl_spark.plans.mapping import FieldMapping, MappingSpec


def _raw(spark):
    rows = [
        # item_id, name, place_uri, lat, lon, label, seq
        (1, "amber sample", "place/rome", 41.9, 12.5, "flammable.0", 1),
        (2, "basalt core", "place/rome", 41.9, 12.5, "inert", 2),
        (3, "resin block", "place/oslo", 59.9, 10.8, " Flammable ", 3),
        (1, "amber sample (relabeled)", "place/rome", 41.9, 12.5, "FLAMMABLE", 4),  # LWW dup
        (4, "pumice chunk", None, None, None, "inert", 5),  # no place
    ]
    return spark.createDataFrame(
        rows,
        "item_id long, name string, place_uri string, lat double, lon double,"
        " label string, seq long",
    )


def _build(spark, raw, base):
    # 1. entity extraction: places dim — dedup on URI (first-wins, like
    #    places.py:52), mint deterministic UUID, geojson point
    places = (
        raw.where(F.col("place_uri").isNotNull())
        .groupBy("place_uri")
        .agg(F.min(F.struct("seq", "lat", "lon")).alias("_w"))
        .select(
            "place_uri",
            deterministic_uuid(F.lit("place"), F.col("place_uri")).alias("place_uuid"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array("_w.lon", "_w.lat").alias("coordinates"),
            ).alias("geo"),
        )
    )

    # 2. items staging via the mapping DSL: LWW per item_id (dict-overwrite
    #    semantics, ref_collection.py:95-97), normalized label, minted id
    spec = MappingSpec(
        name="items",
        key=("item_id",),
        fields=(
            FieldMapping("name", "name_lang", transform="lang_dict_json"),
            FieldMapping("label", "safety_label", transform="normalize_label"),
            FieldMapping("place_uri", "place_uri"),
        ),
        minted_ids={"item_uuid": ("item_id",)},
        lww_order=("seq",),
    )
    items = spec.compile(raw)
    # related-resource join: attach the place dim's minted UUID (broadcast)
    items = items.join(F.broadcast(places.select("place_uri", "place_uuid")), "place_uri", "left")

    # 3. ordered idempotent apply: places BEFORE items (statement order
    #    matters, README.md:41-42) into snapshot tables
    t_places = SnapshotTable(
        spark, f"{base}/places", key_cols=("place_uri",), order_cols=("place_uri",), n_buckets=4
    )
    t_items = SnapshotTable(
        spark, f"{base}/items", key_cols=("item_id",), order_cols=("item_id",), n_buckets=4
    )
    t_places.merge(places.withColumn("op", F.lit("U")), batch_id="load-places")
    t_items.merge(items.withColumn("op", F.lit("U")), batch_id="load-items")
    return t_places, t_items


def test_reference_lifecycle_end_to_end(spark, tmp_path):
    raw = _raw(spark)
    t_places, t_items = _build(spark, raw, str(tmp_path))

    places = {r["place_uri"]: r for r in t_places.read().collect()}
    items = {r["item_id"]: r for r in t_items.read().collect()}

    assert set(places) == {"place/rome", "place/oslo"}
    assert len(items) == 4  # LWW collapsed the item_id=1 duplicate
    # LWW kept the later row (seq 4), label normalized like groups.py:106-111
    assert "relabeled" in items[1]["name_lang"]
    assert items[1]["safety_label"] == "FLAMMABLE"
    assert items[3]["safety_label"] == "FLAMMABLE"
    # referential integrity: every item's place_uuid resolves in the dim
    place_uuids = {r["place_uuid"] for r in places.values()}
    for it in items.values():
        if it["place_uri"] is not None:
            assert it["place_uuid"] in place_uuids
    assert items[4]["place_uuid"] is None
    # deterministic minting: same inputs → same uuids on rebuild
    t_places2, t_items2 = _build(spark, raw, str(tmp_path / "again"))
    assert {r["place_uuid"] for r in t_places2.read().collect()} == place_uuids


def test_reference_lifecycle_reapply_is_noop(spark, tmp_path):
    raw = _raw(spark)
    t_places, t_items = _build(spark, raw, str(tmp_path))
    v_p, v_i = t_places.current_version(), t_items.current_version()
    # re-running the load (same batch ids) must be a no-op, like the
    # generated `INSERT … WHERE pk NOT IN` (ref_collection.py:305-314)
    places = t_places.read()
    st = t_places.merge(places.withColumn("op", F.lit("U")), batch_id="load-places")
    assert not st.applied and st.skipped_reason == "already-committed"
    assert t_places.current_version() == v_p and t_items.current_version() == v_i
