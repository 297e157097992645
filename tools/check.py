#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB-oracle compare.

NOT part of the shipped library (the Scala engine has no Python deps) —
this exists so oracle SQL can be validated before the driver's graded run.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
  1. registers <sfDir>/*.parquet as DuckDB views named by table
  2. runs every query in <verifyOutDir>/oracle_sql.json
  3. loads the Spark result parquet for the same name
  4. compares: columns sorted by name, rows sorted, exact for non-floats,
     reports both exact and approx (rtol 1e-9) status for floats
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to naive UTC for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b
        approx = exact or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
        return exact, approx
    return a == b, a == b


# Oracle output dtypes that hash differently from Spark's on the driver
# side even when every value matches (int128 / decimal serialization).
# rag_context_pack's uncast `sum(BIGINT) OVER (...)` (DuckDB → HUGEINT)
# cost three rounds of red before a DESCRIBE sweep found it; round 2 paid
# the same tax on three aggregate columns. Any oracle emitting one of
# these must CAST the column (usually to BIGINT or DOUBLE).
HAZARD_DTYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def dtype_ratchet(con, oracle):
    """DESCRIBE every oracle; fail on int128/decimal output columns."""
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append((name, f"DESCRIBE error: {e}"))
            continue
        for col_name, col_type, *_ in desc:
            if any(h in col_type.upper() for h in HAZARD_DTYPES):
                bad.append((name, f"column {col_name} is {col_type}"))
    for name, why in bad:
        print(f"DTYPE-FAIL {name}: {why} — CAST it in the oracle SQL")
    return len(bad)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    n_fail += dtype_ratchet(con, oracle)
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        import os
        if not os.path.exists(f"{out_dir}/{name}"):
            # absent result dir = query filtered out of this Verify run
            n_skip += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        exact_bad = approx_bad = 0
        first = None
        for col_name in exp.columns:
            ev, gv = exp[col_name].tolist(), got[col_name].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a is pd.NaT:
                    a = None
                if b is pd.NaT:
                    b = None
                ex, ap = cells_equal(a, b)
                if not ex:
                    exact_bad += 1
                    if first is None:
                        first = (col_name, i, a, b)
                if not ap:
                    approx_bad += 1
        if approx_bad:
            print(f"FAIL {name}: {approx_bad} cells differ beyond tolerance; "
                  f"first={first}")
            n_fail += 1
        elif exact_bad:
            print(f"WARN {name}: PASS approx, but {exact_bad} cells not "
                  f"bit-exact; first={first}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(exp)} rows, {len(exp.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} not-run")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
