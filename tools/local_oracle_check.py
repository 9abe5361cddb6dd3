"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf-dir parquet tables,
and compare row multisets (columns sorted by name, values stringified).

Usage: python3 tools/local_oracle_check.py <verifyOutDir> <sfDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_s(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def _s(v):
    # Bit-faithful to the driver's hash: NO integral-float coercion — a
    # DuckDB HUGEINT sum arriving as float64 must FAIL here like it fails
    # there (the round-1 local gate masked exactly that bug).
    if v is None or v != v:
        return "<null>"
    return str(v)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        got = pd.read_parquet(p)
        if name in oracle:
            want = con.execute(oracle[name]).df()
            if sorted(got.columns) != sorted(want.columns):
                print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
                failures += 1
                continue
            g, w = canon(got), canon(want)
            if g == w:
                print(f"OK   {name}: {len(g)} rows match oracle")
            else:
                failures += 1
                diff = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
                print(f"FAIL {name}: {len(g)} vs {len(w)} rows; first diffs at {diff}")
                for i in diff:
                    print(f"  spark : {g[i]}")
                    print(f"  duckdb: {w[i]}")
        else:
            status = "rows-only" if len(got) > 0 else "EMPTY (suspicious)"
            print(f"INFO {name}: no oracle, {len(got)} rows [{status}]")
            if len(got) == 0:
                failures += 1
    print("RESULT:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
