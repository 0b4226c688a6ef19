#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT part of the
library; dev tooling only).

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads each <out>/<name> parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against views over the sf
parquet tables, sorts columns by name + rows by all columns, and
compares values exactly (floats: exact first, then reports max ulp-ish
diff if not).
"""
import json, math, sys, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for sorting/compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              str(type(v)).find("ndarray") >= 0 else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a query that threw in Verify writes no dir — that must FAIL the
    # gate, not silently vanish from the tally
    present = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) - present):
        print(f"  [MISSING] {name}: no Verify output (query threw?)")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"  [{status}] {name}: {len(got)} rows")
            if len(got) == 0:
                n_fail += 1
                continue
            # cross-engine recall for the IVF ANN: centroid geometry is
            # engine-specific (rows-only), but the ANSWER is gradeable —
            # grade Spark's probed-cell top-k against DuckDB's exact
            # brute-force top-k, independently recomputed. Registry
            # defaults: k=5, nQueries=50. Floor matches RecallSpec's
            # break-glass bound (random probing of 2/16 cells ~ 0.125).
            if name == "ann_ivf":
                exact = con.execute("""
                    SELECT query_id, neighbor_id FROM (
                      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                             row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                                        b.vec_id) AS rn
                      FROM embeddings a, embeddings b
                      WHERE a.vec_id < 50 AND a.vec_id <> b.vec_id)
                    WHERE rn <= 5""").df()
                truth = set(zip(exact.query_id, exact.neighbor_id))
                found = set(zip(got.query_id, got.neighbor_id))
                recall = len(truth & found) / max(len(truth), 1)
                ok = recall >= 0.25
                print(f"  [{'RECALL' if ok else 'RECALL-FAIL'}] ann_ivf: "
                      f"cross-engine recall@5 = {recall:.3f} "
                      f"({len(truth & found)}/{len(truth)} vs DuckDB brute force)")
                if not ok:
                    n_fail += 1
                    n_pass -= 1
            n_pass += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  [ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if sorted(g.columns) != sorted(e.columns):
            print(f"  [SCHEMA] {name}: spark={sorted(g.columns)} oracle={sorted(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  [ROWS] {name}: spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                a = gv.astype(float).to_numpy()
                b = ev.astype(float).to_numpy()
                same = [(x == y) or (math.isnan(x) and math.isnan(y)) for x, y in zip(a, b)]
                if not all(same):
                    mx = max(abs(x - y) for x, y in zip(a, b)
                             if not (math.isnan(x) or math.isnan(y)))
                    print(f"  [VAL] {name}.{c}: max abs diff {mx:.3e}")
                    ok = False
            else:
                if not gv.equals(ev):
                    bad = (gv != ev)
                    i = bad.idxmax()
                    print(f"  [VAL] {name}.{c}: first diff @row{i}: spark={gv[i]!r} oracle={ev[i]!r}")
                    ok = False
        if ok:
            print(f"  [PASS] {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
