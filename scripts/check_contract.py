"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query via Spark AND its DuckDB oracle on the same parquet,
compare row counts + order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v.is_integer():
            return int(v)
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


_KINDS = {
    "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
    "bigint": "int", "hugeint": "huge", "ubigint": "int", "uinteger": "int",
    "float": "float", "real": "float", "double": "float",
    "string": "str", "varchar": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ns": "ts", "timestamp_ntz": "ts",
    "timestamp with time zone": "ts",
    "date": "date",
}


def _type_kind(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "float"
    if t.startswith("array") or t.endswith("[]"):
        return "array"
    return _KINDS.get(t, t)


def rows_normalized(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # data-derived oracle generators (IVF centroids) must target this table
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    only = set(sys.argv[2:])

    import __spark_entry__ as entry

    from cflog2otel_spark.session import get_spark

    spark = get_spark(master="local[4]", app_name="contract", shuffle_partitions=4)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            otypes = dict(zip(rel.columns, (str(t) for t in rel.types)))
            orows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        sc, sn = rows_normalized(scols, srows)
        oc, on = rows_normalized(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} duck={oc}")
            failures += 1
            continue
        # schema kind check (the driver's schema_match): a DuckDB HUGEINT
        # against a Spark BIGINT hash-mismatches in the driver even when
        # values agree — catch that class locally
        mism = [
            (c, stypes[c], otypes[c])
            for c in sc
            if _type_kind(stypes[c]) != _type_kind(otypes[c])
        ]
        if mism:
            print(f"FAIL {name}: schema kind mismatch {mism}")
            failures += 1
            continue
        if len(sn) != len(on):
            print(f"FAIL {name}: rowcount spark={len(sn)} duck={len(on)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(sn, on) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: spark={bad[0][0]} duck={bad[0][1]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(sn)} rows match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
