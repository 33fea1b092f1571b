"""Self-check harness mirroring the driver's CORRECTNESS gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, compares row count + column names +
a value hash (columns sorted by name, rows sorted, floats rounded).

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    # env SELFCHECK_JSON=<path>: also write a per-query result map (the
    # committed evidence for queries registered past the driver's 50-query
    # correctness window — same compare as the driver: rows + sorted column
    # names + value hash)
    json_out = os.environ.get("SELFCHECK_JSON")
    results: dict[str, dict] = {}
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from arches_rascoll_etl_spark.session import get_spark

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spark = get_spark(cores=int(os.environ.get("SELFCHECK_CORES", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import time as _time

    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_q = _time.time()
        try:
            df = fn(spark, sf_dir)
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}", flush=True)
            n_bad += 1
            results[name] = {"status": "FAIL", "problems": [f"spark error: {e}"[:300]]}
            continue
        t_spark = _time.time() - t_q
        sql = oracles.get(name)
        if not sql:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[spark {t_spark:.1f}s]", flush=True)
            n_rows_only += 1
            results[name] = {"status": "rows-only", "rows": len(srows)}
            continue
        t_o = _time.time()
        # oracle watchdog (SELFCHECK_ORACLE_TIMEOUT_S): a handful of
        # oracles are deliberately naive SQL whose cost is super-linear in
        # sf (q39/q85's recursive-CTE transitive closure enumerates
        # O(component^2) (id,label) pairs — dense near-dup components at
        # sf0.1 make that explode while the Spark side's pointer-jumping
        # min-label stays O(E log d)). An interrupted oracle is recorded
        # honestly as oracle-timeout with the Spark row count, never as a
        # pass.
        timeout_s = float(os.environ.get("SELFCHECK_ORACLE_TIMEOUT_S", "0") or 0)
        timer = None
        timer_fired = []
        if timeout_s > 0:
            import threading

            def _interrupt():
                timer_fired.append(True)
                con.interrupt()

            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except duckdb.InterruptException:
            print(f"skip  {name}: oracle exceeded {timeout_s:.0f}s budget "
                  f"(spark side: {len(srows)} rows in {t_spark:.1f}s)",
                  flush=True)
            n_rows_only += 1
            results[name] = {
                "status": "oracle-timeout", "rows": len(srows),
                "oracle_timeout_s": timeout_s,
            }
            continue
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}", flush=True)
            n_bad += 1
            results[name] = {"status": "FAIL", "problems": [f"duckdb error: {e}"[:300]]}
            continue
        finally:
            if timer is not None:
                timer.cancel()
                if timer_fired:
                    # cancel raced the timer: the interrupt landed after
                    # this oracle finished and would otherwise abort the
                    # NEXT query (mis-recorded as ITS timeout). Absorb the
                    # pending interrupt on a throwaway statement.
                    try:
                        con.execute("SELECT 1").fetchall()
                    except duckdb.InterruptException:
                        pass
        t_oracle = _time.time() - t_o
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif value_hash(srows, scols) != value_hash(orows, ocols):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}", flush=True)
            n_bad += 1
            results[name] = {"status": "FAIL", "problems": problems}
        else:
            print(f"ok    {name}: {len(srows)} rows "
                  f"[spark {t_spark:.1f}s oracle {t_oracle:.1f}s]", flush=True)
            n_ok += 1
            results[name] = {
                "status": "exact", "rows": len(srows),
                "rows_match": True, "schema_match": True, "hash_match": True,
            }
    print(f"\n{n_ok} exact-ok, {n_rows_only} rows-only, {n_bad} FAILED")
    if json_out:
        import json as _json
        import subprocess
        import time as _time
        try:
            sha = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True, text=True,
                cwd=Path(__file__).resolve().parent.parent,
            ).stdout.strip()
        except OSError:
            sha = None
        with open(json_out, "w") as f:
            _json.dump({"sf_dir": sf_dir, "git_sha": sha,
                        "generated_at": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
                        "n_exact": n_ok, "n_rows_only": n_rows_only,
                        "n_failed": n_bad, "queries": results}, f, indent=1)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
