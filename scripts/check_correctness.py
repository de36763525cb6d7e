"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in ``__spark_entry__.py`` on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted-by-name schema, and a value hash of the sorted rows.

DRIVER-FAITHFUL canonicalization (r02 lesson): the driver pulls both
sides into pandas, lexsorts over all output columns, and hashes values
dtype-SENSITIVELY.  This replica does the same — so it crashes where the
driver crashes (array-typed gate columns are unhashable in the lexsort)
and mismatches where it mismatches (DuckDB HUGEINT aggregates land in
pandas as float64: ``123.0`` != Spark's int64 ``123``).  It additionally
LINTS the three shapes that produced r01/r02 reds before they reach the
driver:

- float32 gate columns (hash-mismatch vs the oracle's float64),
- array-typed gate columns (driver canonicalizer crash),
- pandas dtype-kind disagreement between Spark and oracle columns
  (the un-cast DuckDB integer-aggregate class),

and warns when ``queries()`` exceeds the 50 rows the driver records.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
       python scripts/check_correctness.py --audit CORRECTNESS_rNN.json
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

DRIVER_ROW_LIMIT = 50  # CORRECTNESS_r02 recorded exactly the first 50 entries


def _cell(v):
    """Dtype-sensitive value canonicalization (driver-style): int 123 and
    float 123.0 normalize DIFFERENTLY."""
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "\0"
    if isinstance(v, bool) or isinstance(v, type(np.bool_(True))):
        return str(bool(v))
    if isinstance(v, (np.floating, float)):
        if math.isnan(float(v)):
            return "\0"
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_hash(pdf):
    """Driver-style canonicalization: lexsort over ALL columns (raises on
    unhashable cells exactly like the driver), then hash rows under
    sorted column names with dtype-sensitive cells."""
    cols = sorted(pdf.columns)
    pdf = pdf.sort_values(by=cols)  # the driver's crash point for arrays
    lines = sorted(
        "|".join(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def _lint(name, sdf, spark_pdf, oracle_pdf):
    """Pre-driver shape lints; returns a list of warning strings."""
    warns = []
    f32 = [f.name for f in sdf.schema.fields if "float" in f.dataType.simpleString()]
    if f32:
        warns.append(f"FLOAT32_COLS {f32} — will hash-mismatch vs double oracle")
    arr = [f.name for f in sdf.schema.fields if f.dataType.simpleString().startswith("array")]
    if arr:
        warns.append(f"ARRAY_COLS {arr} — driver canonicalizer crashes on lexsort")
    if oracle_pdf is not None:
        for c in spark_pdf.columns:
            if c not in oracle_pdf.columns:
                continue
            sk, ok = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
            if sk != ok and {sk, ok} == {"i", "f"}:
                warns.append(
                    f"DTYPE_KIND {c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}"
                    " — un-cast DuckDB integer aggregate? add CAST(... AS BIGINT)"
                )
    return warns


def audit(correctness_file: str) -> int:
    """Assert every queries() key has an all-green row in the driver's
    CORRECTNESS file — the r02 truncation regression check."""
    import __spark_entry__ as entry

    with open(correctness_file) as f:
        rows = json.load(f)
    qkeys = list(entry.queries())
    missing = [k for k in qkeys if k not in rows]
    red = [
        k for k in qkeys
        if k in rows and not (
            rows[k].get("rows_match") and rows[k].get("schema_match") and rows[k].get("hash_match")
        )
    ]
    stale = [k for k in rows if k not in qkeys]
    print(f"queries: {len(qkeys)}  rows in file: {len(rows)}")
    print(f"MISSING rows: {missing or 'none'}")
    print(f"NON-GREEN rows: {red or 'none'}")
    if stale:
        print(f"(file has rows for since-renamed/merged keys: {stale})")
    return 1 if (missing or red) else 0


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--audit":
        sys.exit(audit(sys.argv[2]))
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
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    if len(qs) > DRIVER_ROW_LIMIT:
        print(
            f"WARNING: queries() has {len(qs)} entries; the driver records only the "
            f"first {DRIVER_ROW_LIMIT} — entries past the limit get NO gate row: "
            f"{list(qs)[DRIVER_ROW_LIMIT:]}"
        )
    oracles = entry.oracle_sql()
    for k in qs:
        if k not in oracles:
            print(f"NOTE: {k} has no oracle — driver records a weaker rows-only check")
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            spark_pdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            print(f"{name:24s} SPARK_ERROR {str(e)[:160]}")
            continue
        spark_s = time.perf_counter() - t0
        if name not in oracles:
            results[name] = {
                "status": "ROWS_ONLY", "rows": len(spark_pdf), "spark_s": round(spark_s, 2)
            }
            print(f"{name:24s} ROWS_ONLY   rows={len(spark_pdf)}")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            print(f"{name:24s} ORACLE_ERROR {str(e)[:160]}")
            continue
        for w in _lint(name, df, spark_pdf, oracle_pdf):
            print(f"{name:24s} LINT {w}")
        schema_ok = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
        count_ok = len(spark_pdf) == len(oracle_pdf)
        hash_ok, s_lines, o_lines = False, [], []
        if schema_ok and count_ok:
            try:
                s_hash, s_lines = _canon_hash(spark_pdf)
                o_hash, o_lines = _canon_hash(oracle_pdf)
            except TypeError as e:  # the driver's array-column crash
                results[name] = {"status": "CANON_ERROR", "error": str(e)[:300]}
                print(f"{name:24s} CANON_ERROR (driver would err too): {str(e)[:120]}")
                continue
            hash_ok = s_hash == o_hash
        status = "MATCH" if (schema_ok and count_ok and hash_ok) else "MISMATCH"
        results[name] = {
            "status": status,
            "rows": len(spark_pdf),
            "oracle_rows": len(oracle_pdf),
            "schema_ok": schema_ok,
            "hash_ok": hash_ok,
            "spark_s": round(spark_s, 2),
        }
        print(
            f"{name:24s} {status:9s} rows={len(spark_pdf)}/{len(oracle_pdf)} "
            f"schema={'ok' if schema_ok else sorted(spark_pdf.columns)} "
            f"hash={'ok' if hash_ok else 'FAIL'} {spark_s:.1f}s"
        )
        if status == "MISMATCH" and schema_ok and count_ok:
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
