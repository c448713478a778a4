#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run each
oracle_sql.json query in DuckDB over the sf parquet tables and compare
with the Spark parquet dumps (columns sorted by name, rows sorted)."""
import duckdb, json, math, sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v1"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# refuse to compare a dump produced from a DIFFERENT sf than the one
# being checked (a stale /tmp dump at the wrong SF silently passes
# otherwise — round-1 judge finding)
import os
meta_path = f"{out_dir}/meta.json"
if os.path.exists(meta_path):
    meta = json.load(open(meta_path))
    if meta.get("sf_dir") != sf_dir:
        print(f"FATAL: dump in {out_dir} was generated from {meta.get('sf_dir')}, "
              f"not {sf_dir} — regenerate with graft.Verify first")
        sys.exit(2)

def norm(v):
    # Type-strict like the driver's hash: an int and a float with the same
    # value must NOT collapse ('1540' vs '1540.0' is a FAIL — DuckDB
    # HUGEINT/float widening is exactly the bug class this catches).
    if isinstance(v, float):
        if math.isnan(v): return "f:nan"
        return f"f:{v:.9g}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"

def kind(dtype):
    return dtype.kind  # i/u vs f vs O distinguishes int/float/object columns

fails = []
zero_rows = []
for name, sql in sorted(oracle.items()):
    try:
        o = con.sql(sql).df()
        s = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        ocols, scols = sorted(o.columns), sorted(s.columns)
        if ocols != scols:
            fails.append(name); print(f"FAIL {name}: cols oracle={ocols} spark={scols}"); continue
        okinds = [kind(o[c].dtype) for c in ocols]
        skinds = [kind(s[c].dtype) for c in scols]
        # Unify int flavors (i/u) but keep int-vs-float-vs-object distinct.
        unify = lambda ks: ["i" if k in "iu" else k for k in ks]
        if unify(okinds) != unify(skinds):
            fails.append(name)
            print(f"FAIL {name}: dtype mismatch oracle={list(zip(ocols,okinds))} spark={list(zip(scols,skinds))}")
            continue
        if len(o) != len(s):
            fails.append(name); print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}"); continue
        orows = sorted([tuple(norm(x) for x in r) for r in o[ocols].itertuples(index=False)])
        srows = sorted([tuple(norm(x) for x in r) for r in s[scols].itertuples(index=False)])
        if orows != srows:
            bad = next(i for i,(a,b) in enumerate(zip(orows,srows)) if a!=b)
            fails.append(name)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:\n  oracle={orows[bad]}\n  spark ={srows[bad]}")
            continue
        print(f"ok   {name} ({len(o)} rows)")
        if len(o) == 0:
            zero_rows.append(name)
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
# A 0-row pass means both engines agree on EMPTY — technically green, but
# a query whose filter silently went degenerate passes the same way, so
# surface them for a human look (j3_backfill_anti is legitimately 0 at
# sf0.001: the anti-join has no leftover there).
if zero_rows:
    print(f"note: 0-row passes (verify these are intentionally data-dependent): {zero_rows}")
sys.exit(1 if fails else 0)
