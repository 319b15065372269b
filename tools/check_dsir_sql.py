#!/usr/bin/env python3
"""Property-sweep the DuckDB spellings of Dsir.floorDivDuckSql and
Dsir.resampleKeepDuckSql against exact integer references.

DsirSpec proves the SPARK spellings (floorDivSql == Math.floorDiv; the
keep bit == the documented threshold rule) and the q270 oracle gate
proves cross-engine agreement on every corpus-observed value. This
sweep closes the remaining gap for the DUCKDB spellings — mixed-sign
floor division is exactly the class where engines disagree (Spark div
truncates toward zero, DuckDB // floors), so the portable CASE must be
exact on ALL inputs, not just fixture-reachable ones.

Both SQL texts are EXTRACTED from operators/Dsir.scala at runtime via
the shared tools/dsir_sql.py (the check_flog2.py convention), and the
keep-rule reference derives its uniform width from the SAME
ResampleUniformBits constant, so no spelling or constant can drift.

Usage: python3 tools/check_dsir_sql.py  (PASS/FAIL, nonzero on FAIL)
"""
import random
import sys

import duckdb

import dsir_sql


def main() -> int:
    rnd = random.Random(7)
    con = duckdb.connect()

    # floor division: mixed signs, boundaries, big magnitudes (the
    # helper's stated validity bound is a > Long.MinValue + b; the
    # sweep stays inside it, as every engine caller does)
    nums = ([0, 1, -1, 2, -2, 3, -3, 6, -6, 7, -7, 1000001, -1000001] +
            [rnd.randrange(-(1 << 50), 1 << 50) for _ in range(400)])
    dens = [1, 2, 3, 4, 7, 64, 1024, (1 << 40) + 1]
    fd_cases = [(a, b) for a in nums for b in dens]
    vals = ", ".join(f"({a}, {b})" for a, b in fd_cases)
    fd_sql = dsir_sql.render("floorDivDuckSql", a="a", b="b")
    got = con.execute(
        f"SELECT {fd_sql} FROM (VALUES {vals}) t(a, b)").fetchall()
    bad = [(c, g[0], c[0] // c[1]) for c, g in zip(fd_cases, got)
           if g[0] != c[0] // c[1]]
    if bad:
        print(f"FAIL floorDiv: {len(bad)}/{len(fd_cases)}, e.g. {bad[:5]}")
        return 1

    # keep rule: every wb_norm regime x uniform boundary values, with
    # the reference derived from the SAME extracted uniform width
    ubits = dsir_sql.uniform_bits()
    wbns = list(range(-(ubits + 40), 6)) + [100, -1000]
    us = [0, 1, 2, (1 << (ubits - 1)) - 1, 1 << (ubits - 1),
          (1 << ubits) - 1] + [rnd.randrange(1 << ubits) for _ in range(50)]
    k_cases = [(w, u) for w in wbns for u in us]

    def ref_keep(w: int, u: int) -> bool:
        if w >= 0:
            thr = 1 << ubits
        elif ubits + w <= 0:
            thr = 1
        else:
            thr = 1 << (ubits + w)
        return u < thr

    vals = ", ".join(f"({w}, {u})" for w, u in k_cases)
    keep_sql = dsir_sql.render("resampleKeepDuckSql",
                               wbNorm="w", u="u", pivotBits="0")
    got = con.execute(
        f"SELECT {keep_sql} FROM (VALUES {vals}) t(w, u)").fetchall()
    bad = [(c, g[0], ref_keep(*c)) for c, g in zip(k_cases, got)
           if bool(g[0]) != ref_keep(*c)]
    if bad:
        print(f"FAIL keep: {len(bad)}/{len(k_cases)}, e.g. {bad[:5]}")
        return 1

    print(f"PASS: floorDiv {len(fd_cases)}/{len(fd_cases)}, "
          f"keep {len(k_cases)}/{len(k_cases)} exact "
          f"(SQL extracted from {dsir_sql.DSIR_SCALA.name}, "
          f"uniform width {ubits})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
