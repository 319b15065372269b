#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = parquet views
over <sfDir>), and compares: schema (column names AND DESCRIBE types), row
count, and exact values after sorting columns by name and rows by all columns.

Type gate (round-8 lesson): the driver's hasher renders DECIMAL and HUGEINT
divergently across its two read paths even when values are bit-identical —
the ONLY 4 red rows in CORRECTNESS_r08 were exactly the registry's DECIMAL-
output queries plus its one un-cast HUGEINT oracle, while pandas' lossy
float64 conversion hid the divergence from the old name-only compare here.
So this gate now (a) DESCRIBEs both sides and fails on any column type
mismatch (integer WIDTHS included — the driver canonicalizes them, but width
agreement costs one cast and keeps the surface honest), and (b) bans
DECIMAL/HUGEINT outright at the output boundary on either side.
"""
import json
import re
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types the driver is known to render divergently across its read paths.
BANNED = ("DECIMAL", "HUGEINT", "UHUGEINT")


def canon_type(t: str) -> str:
    """Normalize DuckDB DESCRIBE types for cross-side compare.

    TIMESTAMP flavors collapse (Spark writes isAdjustedToUTC parquet that
    DuckDB reads as TIMESTAMP WITH TIME ZONE while the oracle computes plain
    TIMESTAMP — same instants); the banned types keep their family name so
    the ban message is readable.
    """
    t = t.strip().upper()
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    t = re.sub(r"DECIMAL\(\d+,\s*\d+\)", "DECIMAL", t)
    return t


def types_of(con, query: str) -> dict:
    return {r[0]: canon_type(r[1])
            for r in con.execute(f"DESCRIBE {query}").fetchall()}


def type_gate(got_t: dict, exp_t: dict) -> list:
    errs = []
    for side, ts in (("spark", got_t), ("oracle", exp_t)):
        for c, t in sorted(ts.items()):
            if any(b in t for b in BANNED):
                errs.append(f"TYPE-BAN {side}.{c}: {t}")
    for c in sorted(set(got_t) & set(exp_t)):
        if got_t[c] != exp_t[c]:
            errs.append(f"TYPE {c}: spark={got_t[c]} oracle={exp_t[c]}")
    return errs


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    import os
    dirs = set(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    # iterate the ORACLE keys (plus any extra rows-only dumps): a query
    # that crashed in Verify writes no directory and must FAIL here, not
    # silently vanish from the gate
    names = sorted(dirs | set(oracles))
    for name in names:
        if name not in dirs:
            n_fail += 1
            print(f"[FAIL] {name}: no output written (query crashed in Verify?)")
            continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(got)}")
            continue
        exp = con.execute(oracles[name]).df()
        g, e = canon(got), canon(exp)
        status = type_gate(types_of(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'"),
                           types_of(con, oracles[name]))
        if list(g.columns) != list(e.columns):
            status.append(f"COLS got={list(g.columns)} exp={list(e.columns)}")
        elif len(g) != len(e):
            status.append(f"ROWS got={len(g)} exp={len(e)}")
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status.append("VALUES " + str(ex).split("\n")[0])
                # show first differing rows for debug
                neq = (g.astype(str) != e.astype(str)).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    status.append(f" first diff row {i}: got={g.iloc[i].to_dict()} exp={e.iloc[i].to_dict()}")
        if status:
            n_fail += 1
            print(f"[FAIL] {name}: " + " | ".join(status))
        else:
            print(f"[ok]   {name}: rows={len(g)}")
    print(f"\n{len(names) - n_fail}/{len(names)} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
