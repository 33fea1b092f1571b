"""spark-submit driver for the CDC replay (binlog replay → lake upsert).

The engine package is shipped to executors with ``--py-files`` (see
tools/submit_replay.sh); this top-level file only delegates. On a real
cluster, ``spark-submit --master <cluster> --py-files engine.zip`` runs the
identical code — session.py only sets a local master when none is
configured.
"""

from arches_rascoll_etl_spark.replay_bench import main

if __name__ == "__main__":
    main()
