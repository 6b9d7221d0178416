"""Driver-mimic: run every queries() entry on Spark at sf0.01 and compare to
oracle_sql() via DuckDB (row count + schema + order-insensitive value hash).

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(repr(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def arrow_rows(tbl) -> tuple[list[tuple], list[str]]:
    """Materialize an Arrow table as typed Python rows.

    Going through Arrow (not fetchall/collect) preserves type-level divergence:
    DuckDB sum(BIGINT) -> HUGEINT -> decimal128 surfaces as Decimal('..'),
    whose repr differs from a Spark long's int repr — exactly the class of
    driver-only mismatch that plain fetchall() masked for three rounds.
    """
    cols = tbl.column_names
    pylists = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*pylists)) if pylists else []
    return rows, cols


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from cloudtiff_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("correctness", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            try:
                srows, scols = arrow_rows(sdf.toArrow())
            except Exception:
                srows = [tuple(r) for r in sdf.collect()]
                scols = sdf.columns
        except Exception as exc:
            print(f"FAIL  {name:18s} spark error: {exc}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"weak  {name:18s} rows={len(srows):7d}  ({t1-t0:5.1f}s spark) rows-only")
            continue
        try:
            res = con.execute(oracles[name])
            orows, ocols = arrow_rows(res.arrow())
        except Exception as exc:
            print(f"FAIL  {name:18s} oracle error: {str(exc)[:200]}")
            failures.append(name)
            continue
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok = len(srows) == len(orows) and sorted(scols) == sorted(ocols) and sh == oh
        status = "ok   " if ok else "FAIL "
        print(
            f"{status} {name:18s} rows={len(srows):7d}/{len(orows):7d} "
            f"cols={'=' if sorted(scols)==sorted(ocols) else 'DIFF'} hash={'=' if sh==oh else 'DIFF'} "
            f"({t1-t0:5.1f}s spark, {time.time()-t1:4.1f}s duck)"
        )
        if not ok:
            failures.append(name)
            if sorted(scols) != sorted(ocols):
                print(f"      spark cols: {sorted(scols)}\n      duck  cols: {sorted(ocols)}")
            # show a few mismatched rows for debugging
            sset = {tuple(r) for r in srows}
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            scanon = {tuple(r[i] for i in order) for r in srows}
            ocanon = {tuple(r[i] for i in oorder) for r in orows}
            for r in list(scanon - ocanon)[:3]:
                print("      spark-only:", r)
            for r in list(ocanon - scanon)[:3]:
                print("      duck-only :", r)
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
