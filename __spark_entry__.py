"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship lake lifecycle on sf0.001 — CDC replay through
SnapshotTable (merge → CAS commit → point lookup via manifest-pruned
read_keys), the engine's actual core; ``queries`` / ``oracle_sql`` expose
every implemented operator from SURVEY.md §2 (see the §8 coverage map) plus
the training-data-pipeline operators: 87 queries, ALL 87 with DuckDB-exact
oracles (several generated programmatically from the
same constants the operators use — minhash affine permutations, simhash bit
votes, LSH plane literals, media byte math, list_reduce Horner fold). q44
runs the full IVF machinery (driver k-means quantizer, Arrow-batched cell
assignment, probe join) at n_probe == n_centroids, the documented exact
degradation, so its oracle is the brute-force cosine top-k SQL;
tests/test_similarity_ivf.py covers partial-probe recall.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from arches_rascoll_etl_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the END-TO-END lake lifecycle —
    replay the CDC log into a bucketed copy-on-write SnapshotTable in two
    merges (each a fused scan→LWW→bucketed write with a CAS manifest
    commit), then answer a point lookup through read_keys' manifest-level
    bucket pruning + In-filter pushdown (driver checks rows > 0)."""
    return Q.all_queries()["q52_lake_point_lookup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.all_queries()


def oracle_sql() -> dict[str, str]:
    return Q.all_oracles()
