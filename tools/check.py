#!/usr/bin/env python3
"""Local dev replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump (from graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against views named after
the parquet tables in <sfDir>, and diffs: schema (column names sorted), row
count, and a hash over row values with columns sorted by name and rows sorted.
"""
import sys, json, glob, os
import duckdb


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row sort over stringified values
    df = df.astype(str).sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        dump = os.path.join(out_dir, name)
        if not os.path.isdir(dump):
            print(f"FAIL {name}: no spark dump")
            n_bad += 1
            continue
        try:
            got = canon(con, f"SELECT * FROM read_parquet('{dump}/*.parquet')")
            want = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
        elif not got.equals(want):
            neq = (got != want).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ; first:")
            print("  spark:", got[neq].head(2).to_dict("records"))
            print("  duckdb:", want[neq].head(2).to_dict("records"))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
