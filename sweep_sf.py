"""Cross-SF oracle sweep: verify registry queries against their DuckDB
oracles at scale factors the pytest/driver gate does NOT run (the gate
is sf0.01). Driver-faithful comparison: column names, row count, and
order-insensitive values under the same normalization as
tests/test_oracle_parity.py (int/float distinction kept, 1e-4 float
tolerance).

Usage:
    python sweep_sf.py                      # all queries, sf0.001 + sf0.1
    python sweep_sf.py --sf sf0.1 q1 q2 ... # subset, one SF

Exit code 0 iff every (query, SF) pair matches exactly.
"""

from __future__ import annotations

import argparse
import math
import sys

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm(v):
    import numpy as np

    if v is None:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "<nan>"
        return f"f{float(v):.4f}"
    if isinstance(v, (int, np.integer)):
        return f"i{int(v)}"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument(
        "--sf",
        action="append",
        help="SF dir name under /root/testdata (repeatable; default sf0.001 + sf0.1)",
    )
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    sfs = args.sf or ["sf0.001", "sf0.1"]

    import duckdb

    import __spark_entry__ as entrymod
    from loggie_spark import get_spark

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args.names or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(master=args.master)
    failures = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{sf} {name}: NO ORACLE (rows-only, {len(srows)} rows)")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            pdf = res.df()
            drows = [
                tuple(
                    None if isinstance(v, float) and math.isnan(v) else v
                    for v in row
                )
                for row in pdf.itertuples(index=False, name=None)
            ]
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and _rowset(scols, srows) == _rowset(dcols, drows)
            )
            status = "EXACT" if ok else "MISMATCH"
            if not ok:
                failures += 1
            print(f"{sf} {name}: {status} ({len(srows)} rows)")
        con.close()
    print(f"\n{'PASS' if failures == 0 else 'FAIL'}: {failures} mismatches")
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
