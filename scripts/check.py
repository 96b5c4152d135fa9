#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of the
engine; the Scala library has no Python dependency).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: schema (column names), row count, and exact values after sorting
columns by name and rows by all columns (the driver hashes — we diff, which
is strictly stricter and tells us *where* a mismatch is)."""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(out_dir, name):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def _cell(v):
    # representation-INSENSITIVE canonical string for object cells: Spark
    # parquet -> pandas gives np.ndarray/bytes where DuckDB fetchdf gives
    # list/bytearray for value-identical data, and astype(str) renders
    # those differently ('[1 2 3]' vs '[1, 2, 3]'); NULL also needs a
    # sentinel distinct from the literal string 'None' (r16 review)
    if v is None:
        return "\\N"
    if isinstance(v, float) and v != v:
        # NaN in an object/array cell gets its OWN sentinel, distinct from
        # NULL's '\N' (r17 advice): conflating them would let a Spark-NULL
        # vs DuckDB-NaN divergence pass the gate. The backslash keeps it
        # collision-free against a literal string cell "nan" (r17 review —
        # same reason NULL is '\N', not 'None'). No registry query emits
        # NaN by design (doubles round-trip through DECIMAL — Sql.scala),
        # so this sentinel appearing in a diff is itself a finding.
        return "\\NaN"
    if isinstance(v, (bytes, bytearray)):
        return "hex:" + bytes(v).hex()
    if hasattr(v, "tolist") and not isinstance(v, str):  # np.ndarray/scalar
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp columns to naive UTC for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(_cell)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # enumerate the UNION of written outputs and oracle keys: a query that
    # threw inside Verify writes nothing, and enumerating only the output
    # dirs would silently shrink N instead of failing (the r14 gate-hole
    # review finding). On a subset run (Verify's 3rd arg) only the written
    # subset is checked — missing oracle-keyed outputs count as failures
    # only on a full-registry run, detected by the _FULL_RUN marker Verify
    # writes (a written-count heuristic misclassified a run where most
    # queries threw as a subset run — r15 fix).
    written = sorted(set(os.listdir(out_dir)) - {"oracle_sql.json", "_FULL_RUN"})
    full_run = os.path.exists(os.path.join(out_dir, "_FULL_RUN"))
    names = sorted(set(written) | (set(oracles) if full_run else set()))
    n_pass = n_fail = 0
    for name in names:
        spark_df = load_spark(out_dir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        if name not in oracles:
            print(f"ROWS {name}: rows={len(spark_df)} (no oracle)");  continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}");  n_fail += 1;  continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1;  continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}");  n_fail += 1;  continue
        # exact compare; report first differing cell
        bad = None
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                neq = ~((av == bv) | (av.isna() & bv.isna()))
            except Exception:
                neq = av.astype(str) != bv.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                bad = (c, i, av.iloc[i], bv.iloc[i], av.dtype, bv.dtype)
                break
        if bad:
            c, i, x, y, dx, dy = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r}({dx}) duck={y!r}({dy})")
            n_fail += 1
        else:
            if len(a) == 0:
                print(f"WARN {name}: PASS but 0 rows")
            else:
                print(f"PASS {name}: rows={len(a)}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(names)} total")
    sys.exit(1 if n_fail else 0)

main()
