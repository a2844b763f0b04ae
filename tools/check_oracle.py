#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same sf tables and compare
schema + rows (column-name-sorted, row-sorted, exact values)."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# Queries that THREW during the dump (written by graft.Verify). A missing
# parquet dir is not "no news" — round 5 lost 58 correctness rows to exactly
# that silence.
try:
    threw = json.load(open(f"{out_dir}/_failed.json"))
except FileNotFoundError:
    threw = {}
fails, passes, rows_only = [], [], []
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = qdir.split("/")[-1]
    spark_rel = con.sql(f"select * from read_parquet('{qdir}/*.parquet')")
    if name not in oracle:
        rows_only.append((name, len(spark_rel.fetchall())))
        continue
    try:
        duck_rel = con.sql(oracle[name])
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    scols = sorted(spark_rel.columns)
    dcols = sorted(duck_rel.columns)
    if [c.lower() for c in scols] != [c.lower() for c in dcols]:
        fails.append((name, f"schema mismatch: spark={scols} duck={dcols}"))
        continue
    sdf = spark_rel.df()[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
    ddf = duck_rel.df()[dcols]
    ddf.columns = scols  # case-normalize
    ddf = ddf.sort_values(scols, kind="mergesort").reset_index(drop=True)
    if len(sdf) != len(ddf):
        fails.append((name, f"row count: spark={len(sdf)} duck={len(ddf)}"))
        continue
    bad = None
    for c in scols:
        sv, dv = sdf[c], ddf[c]
        # dtype-strict: the driver hashes serialized values, so int64 vs
        # float64/object (e.g. DuckDB HUGEINT) must fail here like it fails
        # there, even when pandas would equate 357 == 357.0.
        if sv.dtype != dv.dtype:
            bad = f"col {c} dtype mismatch: spark={sv.dtype} duck={dv.dtype}"
            break
        try:
            eq = (sv == dv) | (sv.isna() & dv.isna())
        except Exception:
            eq = sv.astype(str) == dv.astype(str)
        if not eq.all():
            i = (~eq).idxmax()
            bad = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append((name, len(sdf)))

print(f"PASS ({len(passes)}):")
for n, r in passes: print(f"  {n}: {r} rows")
print(f"ROWS-ONLY ({len(rows_only)}):")
for n, r in rows_only: print(f"  {n}: {r} rows")
print(f"FAIL ({len(fails)}):")
for n, m in fails: print(f"  {n}: {m}")
print(f"THREW ({len(threw)}):")
for n, m in sorted(threw.items()): print(f"  {n}: {m[:200]}")
# count integrity: every SELECTED query must be accounted for as dumped|threw.
# _manifest.json (written by graft.Verify) carries the selected-key list; a key
# missing both its parquet dir and a _failed.json entry (verify killed mid-dump,
# stale outDir) is the silent-hole mode this gate exists to close — ENFORCED,
# not just printed.
checked = len(passes) + len(rows_only) + len(fails)
missing = []
try:
    manifest = json.load(open(f"{out_dir}/_manifest.json"))
    accounted = {n for n, _ in passes} | {n for n, _ in rows_only} \
        | {n for n, _ in fails} | set(threw)
    missing = sorted(set(manifest["selected"]) - accounted)
    extra = sorted(accounted - set(manifest["selected"]))
    if missing: print(f"MISSING ({len(missing)}): {', '.join(missing)}")
    if extra: print(f"EXTRA (stale outDir?) ({len(extra)}): {', '.join(extra)}")
    missing += extra
except FileNotFoundError:
    print("WARNING: no _manifest.json — count integrity unverified (old dump?)")
print(f"TOTAL: checked={checked} threw={len(threw)} (must sum to SparkEntry.queries.size)")
sys.exit(1 if (fails or threw or missing) else 0)
