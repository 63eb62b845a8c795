"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, compares row count, column names, and an
order-insensitive value hash. Run me before every commit:

    python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from redshift_to_pendo_api_data_pipeline_spark.session import get_spark
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import TABLES


def _norm(v):
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], columns: list[str]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name:35s} rows-only: {len(srows)} rows")
            continue
        try:
            ores = con.execute(oracles[name])
            orows = ores.fetchall()
            ocols = [d[0] for d in ores.description]
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name:35s} ORACLE ERROR: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        elif value_hash(srows, scols) != value_hash(orows, ocols):
            problems.append("value hash mismatch")
            for a, b in list(zip(sorted(srows), sorted(orows)))[:3]:
                if _norm(a[0]) != _norm(b[0]) or a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
        if problems:
            print(f"✗ {name:35s} {', '.join(problems)}")
            failures += 1
        else:
            print(f"✓ {name:35s} {len(srows)} rows")
    return failures


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
