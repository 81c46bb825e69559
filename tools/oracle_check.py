"""Local stand-in for the driver's CORRECTNESS gate: run each
``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` text on the
same sf dir, compare row counts, column names, and a value hash (columns
sorted by name, rows sorted, floats rounded).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(v):
    import datetime
    import decimal

    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import duckdb

    import __spark_entry__ as E
    from sparrow_ipc_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = E.queries()
    oracles = E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"spark: {type(e).__name__}: {e}"[:300]}
            print(name, "SPARK-ERR", str(e)[:200])
            continue
        if name not in oracles:
            results[name] = {"rows": len(srows), "no_oracle": True}
            print(f"{name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"duckdb: {type(e).__name__}: {e}"[:300]}
            print(name, "DUCK-ERR", str(e)[:200])
            continue
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = (table_hash(scols, srows) == table_hash(ocols, orows)
                      if rows_match and schema_match else False)
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(orows),
        }
        flag = "OK" if hash_match else "MISMATCH"
        print(f"{name}: {flag} spark={len(srows)} oracle={len(orows)} "
              f"schema={schema_match}")
        if not hash_match and rows_match and schema_match and len(srows) <= 20:
            print("  spark :", sorted(srows)[:5])
            print("  oracle:", sorted(orows)[:5])
    bad = [n for n, r in results.items()
           if r.get("err") or (not r.get("no_oracle") and not r.get("hash_match"))]
    print(json.dumps({"bad": bad}))
    spark.stop()


if __name__ == "__main__":
    main()
