#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB correctness gate.

usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json against views over <sfDir>/*.parquet, sorts
columns by name and rows by all columns, and compares values exactly.
NOT part of the shipped library (the Scala engine never imports this).
"""
import duckdb, json, math, sys

TABLES = ["events", "lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(repr(x) for x in t)), [cols[i] for i in order]


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # the driver hashes RENDERED values, so -0.0 != +0.0 there even
        # though Python == treats them equal — compare signbit when both
        # are zero to reproduce the driver's semantics locally
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    return a == b


def main(sfdir, outdir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    failures = []
    for name in sorted(oracle):
        try:
            got_rel = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got_rows, got_cols_s = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp_rows, exp_cols_s = canon(exp_rel.fetchall(), exp_cols)
            # mimic the driver's pandas-dtype strictness (int64 vs float64
            # hash-mismatch even when Python == says equal, e.g. HUGEINT sums)
            # kind, not width: the driver hashes int32==int64 fine, but
            # int-vs-float (or bool-vs-int) renders differently and fails
            got_dt = {c: t.kind for c, t in
                      con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df().dtypes.items()}
            exp_dt = {c: t.kind for c, t in con.execute(oracle[name]).df().dtypes.items()}
        except Exception as e:
            failures.append((name, f"ERROR {e}"))
            continue
        if got_cols_s != exp_cols_s:
            failures.append((name, f"schema: spark={got_cols_s} oracle={exp_cols_s}"))
            continue
        dt_bad = [(c, got_dt.get(c), exp_dt.get(c)) for c in got_cols_s
                  if got_dt.get(c) != exp_dt.get(c)]
        if dt_bad:
            failures.append((name, f"dtype: {dt_bad} (spark vs oracle)"))
            continue
        if len(got_rows) != len(exp_rows):
            failures.append((name, f"rowcount: spark={len(got_rows)} oracle={len(exp_rows)}"))
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if not all(eq(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            failures.append((name, f"value mismatch at sorted-row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}\n  cols  : {got_cols_s}"))
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got_rows)} rows)")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"== {n_ok}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
