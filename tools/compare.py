#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: for every query output in
OUTDIR, run the matching oracle SQL in DuckDB over the same sf tables and
compare values exactly (column names sorted, row order as emitted).

Usage: python3 tools/compare.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr — hash-grade comparison
    return v

def norm_df(df):
    out = df.copy()
    for c in out.columns:
        out[c] = [norm_cell(v) for v in out[c].tolist()]
        # normalize timestamps to a canonical string
        try:
            import numpy as np
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                out[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        except Exception:
            pass
        if str(df[c].dtype) == "object":
            out[c] = [str(v) if hasattr(v, "isoformat") else v for v in out[c]]
    return out

def main(outdir, sfdir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracles):
        sql = oracles[name]
        qdir = f"{outdir}/{name}"
        if not os.path.isdir(qdir):
            print(f"MISSING OUTPUT {name}"); n_fail += 1; fails.append(name); continue
        try:
            got = canon(pd.read_parquet(qdir))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ERROR  {name}: {str(e)[:300]}"); n_fail += 1; fails.append(name); continue
        if list(got.columns) != list(exp.columns):
            print(f"COLS   {name}: got {list(got.columns)} vs oracle {list(exp.columns)}")
            n_fail += 1; fails.append(name); continue
        if len(got) != len(exp):
            print(f"ROWS   {name}: got {len(got)} vs oracle {len(exp)}")
            n_fail += 1; fails.append(name); continue
        g, e = norm_df(got), norm_df(exp)
        eq = g.values.tolist() == e.values.tolist()
        if eq:
            # also surface dtype skew (schema-compare risk) as a warning
            dt_g, dt_e = list(map(str, got.dtypes)), list(map(str, exp.dtypes))
            note = "" if dt_g == dt_e else f"   [dtype skew: {dt_g} vs {dt_e}]"
            print(f"PASS   {name} ({len(got)} rows){note}")
            n_pass += 1
        else:
            n_fail += 1; fails.append(name)
            # locate first mismatching cell
            shown = False
            for i in range(len(g)):
                if g.values[i].tolist() != e.values[i].tolist():
                    print(f"VALUES {name}: first diff at row {i}:")
                    print(f"   got: {g.values[i].tolist()[:8]}")
                    print(f"   exp: {e.values[i].tolist()[:8]}")
                    shown = True
                    break
            if not shown:
                print(f"VALUES {name}: diff not localized")
    print(f"\n{n_pass} pass / {n_fail} fail")
    if fails:
        print("FAILING:", " ".join(fails))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
