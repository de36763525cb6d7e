"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in ``__spark_entry__.py`` on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted-by-name schema, and a value hash of the sorted rows.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style: round-trip repr of float
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            # The driver's value canonicalization is dtype-sensitive and
            # every DuckDB oracle emits float64 — a float32 gate column
            # hash-mismatches even on identical values (r1: interleaved_
            # extract).  Catch it locally.
            f32 = [f.name for f in df.schema.fields if "float" in f.dataType.simpleString()]
            if f32 and name in oracles:
                print(f"{name:24s} FLOAT32_COLS {f32} — will hash-mismatch vs double oracle")
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            print(f"{name:24s} SPARK_ERROR {str(e)[:160]}")
            continue
        spark_s = time.perf_counter() - t0
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(rows), "spark_s": round(spark_s, 2)}
            print(f"{name:24s} ROWS_ONLY   rows={len(rows)}")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            print(f"{name:24s} ORACLE_ERROR {str(e)[:160]}")
            continue
        schema_ok = sorted(cols) == sorted(ocols)
        count_ok = len(rows) == len(orows)
        hash_ok = False
        if schema_ok and count_ok:
            hash_ok = value_hash(rows, cols) == value_hash(orows, ocols)
        status = "MATCH" if (schema_ok and count_ok and hash_ok) else "MISMATCH"
        results[name] = {
            "status": status,
            "rows": len(rows),
            "oracle_rows": len(orows),
            "schema_ok": schema_ok,
            "hash_ok": hash_ok,
            "spark_s": round(spark_s, 2),
        }
        print(
            f"{name:24s} {status:9s} rows={len(rows)}/{len(orows)} "
            f"schema={'ok' if schema_ok else sorted(cols)} hash={'ok' if hash_ok else 'FAIL'} "
            f"{spark_s:.1f}s"
        )
        if status == "MISMATCH" and schema_ok and count_ok:
            # dump first differing rows for debugging
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s_lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            o_lines = sorted("|".join(_norm(r[i]) for i in oorder) for r in orows)
            for a, b in zip(s_lines, o_lines):
                if a != b:
                    print(f"  spark : {a[:200]}")
                    print(f"  oracle: {b[:200]}")
                    break

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(f"\n{n_match}/{len(results)} MATCH")
    with open("/tmp/correctness_local.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
