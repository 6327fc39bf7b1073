"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (columns sorted by name, rows sorted
by their full value tuple). Catches parity bugs before the driver does.

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a per-entry machine-readable record
({name: {status, rows, spark_sec, duck_sec, msg}}) — the committed
full-sweep artifact (FULLSWEEP_r{N}.json) that turns "every entry is
oracle-paired" from a design claim into a per-round measured fact
(VERDICT r10 item 5).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pyspark_scd_spark.session import get_spark  # noqa: E402
from pyspark_scd_spark.sources.readers import TESTDATA_TABLES  # noqa: E402


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict = {}

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, builder in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            t_spark = time.time() - t0
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            record[name] = {"status": "FAIL", "msg": f"spark error: {e}"[:300]}
            continue
        if name not in oracles:
            ok_rows = bool(s_rows)
            print(
                f"rows  {name}: {len(s_rows)} rows (no oracle — rows-only) "
                f"[{time.time()-t0:.1f}s]"
            )
            record[name] = {
                "status": "rows-only" if ok_rows else "FAIL",
                "rows": len(s_rows),
                "spark_sec": round(t_spark, 1),
            }
            if not ok_rows:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
            t_duck = time.time() - t1
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            record[name] = {
                "status": "FAIL",
                "msg": f"duckdb error: {e}"[:300],
            }
            continue

        sc, sr = _canon(s_cols, s_rows)
        dc, dr = _canon(d_cols, d_rows)
        status = "ok  "
        msg = ""
        if sc != dc:
            status, msg = "FAIL", f"columns {sc} vs {dc}"
        elif len(sr) != len(dr):
            status, msg = "FAIL", f"rowcount {len(sr)} vs {len(dr)}"
        elif sr != dr:
            diffs = [
                (a, b) for a, b in zip(sr, dr) if a != b
            ][:3]
            status, msg = "FAIL", f"values differ, e.g. {diffs}"
        if status == "FAIL":
            failures.append(name)
        record[name] = {
            "status": status.strip(),
            "rows": len(sr),
            "spark_sec": round(t_spark, 1),
            "duck_sec": round(t_duck, 1),
        }
        if msg:
            record[name]["msg"] = msg[:300]
        print(
            f"{status}  {name}: {len(sr)} rows "
            f"[spark {t_spark:.1f}s, duckdb {t_duck:.1f}s] {msg}"
        )

    print(
        f"\n{len(failures)} failures out of "
        f"{len(only) if only else len(queries)} checked"
        + (f": {failures}" if failures else "")
    )
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "n_checked": len(record),
            "n_ok": sum(
                1 for v in record.values() if v["status"] == "ok"
            ),
            "n_rows_only": sum(
                1 for v in record.values() if v["status"] == "rows-only"
            ),
            "n_fail": len(failures),
            "failures": failures,
            "entries": record,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
