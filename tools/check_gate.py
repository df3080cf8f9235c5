"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at a
given sf, compare row count, column names, and order-insensitive
value hash. Usage: python tools/check_gate.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from typesense_spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        shuffle_partitions=int(os.environ.get("CHECK_GATE_SHUFFLE", "8"))
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            # Fetch through Arrow, exactly like the driver's hasher.
            # DuckDB renders HUGEINT (the un-CAST sum() type) as float64
            # here, which is precisely the round-1 artifact — so also
            # fail hard on any HUGEINT-typed output column.
            hugeint_cols = [
                c for c, t in zip(rel.columns, rel.types) if str(t) == "HUGEINT"
            ]
            if hugeint_cols:
                print(
                    f"FAIL {name}: HUGEINT oracle columns {hugeint_cols} — "
                    "wrap in CAST(... AS BIGINT)"
                )
                n_fail += 1
                continue
            atab = rel.arrow()
            orows = list(zip(*(c.to_pylist() for c in atab.columns)))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_hash = ok_cols and value_hash(srows, scols) == value_hash(orows, ocols)
        if ok_cols and ok_rows and ok_hash:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: cols {scols} vs {ocols} | rows {len(srows)} vs {len(orows)} | hash {'ok' if ok_hash else 'MISMATCH'}"
            )
            if ok_cols and srows and orows:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(norm_cell(r[i]) for i in order) for r in srows}
                oset = {tuple(norm_cell(r[i]) for i in order) for r in orows}
                print("  only-spark:", list(sset - oset)[:3])
                print("  only-oracle:", list(oset - sset)[:3])
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
