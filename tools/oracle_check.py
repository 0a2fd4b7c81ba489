#!/usr/bin/env python3
"""Driver-replica correctness check: compare each Verify output parquet
against its DuckDB oracle SQL (sorts columns by name, row-order
insensitive, exact value compare). STRICT by default: pandas dtypes must
match per column (the driver's hash is typed — int64 vs float64 fails
even when values are numerically equal, e.g. DuckDB HUGEINT from an
integer SUM vs Spark BIGINT). Usage:
  python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--no-strict]
"""
import duckdb, glob, json, sys, math

sfdir, outdir = sys.argv[1], sys.argv[2]
strict = "--no-strict" not in sys.argv[3:]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for q, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            bad.append((q, f"schema: oracle={list(exp.columns)} got={list(got.columns)}"))
            continue
        if len(exp) != len(got):
            bad.append((q, f"rows: oracle={len(exp)} got={len(got)}"))
            continue
        if strict:
            # Mirror the driver's typed hash: int-vs-float is a FAIL even
            # when every value compares equal numerically (DuckDB HUGEINT
            # from integer SUM → float64 vs Spark int64 — round-1 root
            # cause). The driver canonicalizes integer WIDTHS (int32 ==
            # int64 passed round 1), so compare at that granularity.
            def canon(dt):
                if dt.kind in "iu":
                    return "int"
                return str(dt)
            dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                      for c in exp.columns
                      if canon(exp[c].dtype) != canon(got[c].dtype)]
            if dt_bad:
                c, ed, gd = dt_bad[0]
                bad.append((q, f"dtype: col {c} oracle={ed} got={gd}"
                               + (f" (+{len(dt_bad)-1} more)" if len(dt_bad) > 1 else "")))
                continue
        exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        mismatch = None
        for c in exp.columns:
            ev, gv = exp_s[c], got_s[c]
            try:
                import pandas as pd
                if ev.dtype.kind == 'f' or gv.dtype.kind == 'f':
                    eq = [(a == b) or (isinstance(a, float) and isinstance(b, float)
                          and math.isnan(a) and math.isnan(b)) or a == b
                          for a, b in zip(ev.astype(float), gv.astype(float))]
                else:
                    eq = list(ev.astype(str) == gv.astype(str))
            except Exception as e:
                eq = list(ev.astype(str) == gv.astype(str))
            if not all(eq):
                i = eq.index(False)
                mismatch = f"col {c} row {i}: oracle={exp_s[c][i]!r} got={got_s[c][i]!r}"
                break
        if mismatch:
            bad.append((q, mismatch))
        else:
            ok.append(q)
    except Exception as e:
        bad.append((q, f"error: {e}"))

for q in ok:
    print(f"PASS {q}")
for q, why in bad:
    print(f"FAIL {q}: {why}")
print(f"\n{len(ok)}/{len(ok)+len(bad)} queries match the oracle")
sys.exit(1 if bad else 0)
