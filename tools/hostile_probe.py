"""Hostile-session probe (verify step 2): the driver supplies its OWN
SparkSession with unknown timezone / parquet configs. Run the
timestamp-sensitive queries in all four (session tz) x
(inferTimestampNTZ) quadrants with the driver-style Arrow-typed hash
compare; every value-bearing query must match in every quadrant.

`env_probe` is EXPECTED to mismatch in foreign-tz / NTZ-off quadrants —
it ENCODES those environment facts in its row count (that's its job);
the probe asserts the encoded digits move exactly as designed instead.

Usage: python tools/hostile_probe.py   [env: SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_correctness import arrow_rows, value_hash  # noqa: E402 — the
# canonical driver-parity compare; re-implementing it here could silently
# diverge from the mimic (it changed once already, to catch typed values)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: queries whose values must be tz/NTZ-independent
STRICT = ["pricing_summary", "top_orders", "sessionize", "top_parts"]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    failures = []
    for tz, tz_off_q in (("America/Los_Angeles", -8 * 4), ("Asia/Tokyo", 9 * 4)):
        for ntz in ("true", "false"):
            spark = (
                SparkSession.builder.master("local[8]")
                .appName(f"hostile-{tz}-{ntz}")
                .config("spark.sql.session.timeZone", tz)
                .config("spark.sql.parquet.inferTimestampNTZ.enabled", ntz)
                .config("spark.sql.shuffle.partitions", "8")
                .config("spark.ui.showConsoleProgress", "false")
                .getOrCreate()
            )
            spark.sparkContext.setLogLevel("ERROR")
            con = duckdb.connect()
            for t in TABLES:
                p = os.path.join(SF_DIR, f"{t}.parquet")
                if os.path.exists(p):
                    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
            for name in STRICT:
                sdf = E.queries()[name](spark, SF_DIR)
                srows, scols = arrow_rows(sdf.toArrow())
                res = con.execute(E.oracle_sql()[name])
                orows, ocols = arrow_rows(res.arrow())
                ok = (
                    len(srows) == len(orows)
                    and sorted(scols) == sorted(ocols)
                    and value_hash(srows, scols) == value_hash(orows, ocols)
                )
                print(f"{'ok  ' if ok else 'FAIL'} {tz:20s} ntz={ntz:5s} {name}")
                if not ok:
                    failures.append((tz, ntz, name))
            # env_probe digit movement: tz digit = (tzq + 56)*10 shifts by
            # the session-vs-UTC offset in quarter hours; ntz digit flips
            # 1 -> 2 when inferTimestampNTZ is off
            n = E.queries()["env_probe"](spark, SF_DIR).count()
            tz_digits = (n // 10) % 1000
            ntz_digit = (n // 10000) % 10
            want_tz = 56 + tz_off_q
            want_ntz = 1 if ntz == "true" else 2
            ok = tz_digits == want_tz and ntz_digit == want_ntz
            print(
                f"{'ok  ' if ok else 'FAIL'} {tz:20s} ntz={ntz:5s} env_probe digits "
                f"tz={tz_digits} (want {want_tz}) ntz={ntz_digit} (want {want_ntz})"
            )
            if not ok:
                failures.append((tz, ntz, "env_probe-digits"))
            spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
