#!/usr/bin/env python3
"""Time the DuckDB oracle side (dev harness, mirrors the judge's ratio
measurement): run every oracle SQL from a Verify output dir against the
given fixture at full thread count, best-of-N, print the total.

NOT part of the shipped library — exists so SURVEY §8's honest-numbers
table can report a same-host Spark-vs-DuckDB ratio each round.

Usage: python3 tools/ducktime.py <sfDir> <verifyOutDir> [reps=2]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    best = {}
    for r in range(reps):
        for name, sql in sorted(oracle.items()):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    total = sum(best.values())
    slow = sorted(best.items(), key=lambda kv: -kv[1])[:10]
    print(f"duckdb total (best-of-{reps}) over {len(best)} queries: "
          f"{total:.1f} s")
    for n, t in slow:
        print(f"  {n:32s} {t:5.2f}")
    with open("DUCK_DETAIL.json", "w") as f:
        json.dump({k: round(v, 4) for k, v in best.items()}, f,
                  sort_keys=True)
    print("per-query times -> DUCK_DETAIL.json")


if __name__ == "__main__":
    main()
