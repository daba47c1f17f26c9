#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: localcheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (Spark output) and runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB over views of the sfDir
tables; sorts columns by name + rows, compares values exactly.
Dev-only tool — the shipped library is pure Scala/Spark.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # stamp the gate environment next to the verify artifact: "N/N
    # hash-exact" claims are only meaningful scoped to the DuckDB build
    # they were measured against (the driver's build differs — rounds
    # 6/7 both shipped claims its engine then falsified)
    meta = {"duckdb_version": duckdb.__version__,
            "python": sys.version.split()[0], "sf_dir": sf_dir}
    with open(f"{out_dir}/_local_gate_meta.json", "w") as f:
        json.dump(meta, f)
    print(f"[localcheck] DuckDB {duckdb.__version__} "
          f"(claims must cite this version; driver artifact is ground truth)")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            expect = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(duckdb.query(f"SELECT * FROM parquet_scan({files!r})").fetchdf())
        if list(got.columns) != list(expect.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        # dtype gate: an oracle column that comes back float64 where Spark
        # wrote an integer means an uncast HUGEINT/DECIMAL aggregate in the
        # oracle SQL. Round 8 proved the driver's hash is type-rendering
        # sensitive in exactly this direction (p33/p40/p41/p46 red with
        # rows+schema+values matching), while the opposite direction
        # (spark float vs oracle int, q127) passes — so fail hard only on
        # the fatal direction and warn on any other dtype skew.
        dtype_fail = False
        for c in got.columns:
            gd, ed = str(got[c].dtype), str(expect[c].dtype)
            if gd != ed:
                if ed == "float64" and gd.startswith("int"):
                    print(f"FAIL {name}: oracle col {c} is {ed} but spark is {gd}"
                          " (uncast SUM/HUGEINT in oracle SQL — driver-red class)")
                    dtype_fail = True
                    break
                print(f"WARN {name}: col {c} dtype skew oracle={ed} spark={gd}")
        if dtype_fail:
            n_fail += 1
            continue
        if len(got) != len(expect):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            ga, ea = got[c].tolist(), expect[c].tolist()
            for i, (g, e) in enumerate(zip(ga, ea)):
                if not values_equal(g, e):
                    diffs.append((c, i, g, e))
                    if len(diffs) > 3:
                        break
            if len(diffs) > 3:
                break
        if diffs:
            print(f"FAIL {name}: {len(diffs)}+ value diffs, first: {diffs[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
