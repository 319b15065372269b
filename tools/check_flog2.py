#!/usr/bin/env python3
"""Property-sweep the DuckDB spelling of Dsir.flog2DuckSql against an
exact integer reference.

DsirSpec proves the SPARK spelling equals BigInt floor(log2(num/den));
the oracle gate proves the two engine spellings agree on every
corpus-observed value. This sweep closes the remaining gap: it checks
the DUCKDB spelling against the mathematical reference on ~5000 cases
covering power-of-two boundaries (the exact-power branch), off-by-one
neighbors, and random 50-bit values — so cross-engine equality holds
for ALL inputs, not just the ones a fixture happens to produce.

The SQL text is EXTRACTED from the Scala source at runtime via the
shared tools/dsir_sql.py, so the sweep always validates the spelling
the engine actually ships — drift is impossible by construction.

Usage: python3 tools/check_flog2.py   (prints PASS/FAIL, exits nonzero on FAIL)
"""
import random
import sys

import duckdb

import dsir_sql


def ref(num: int, den: int) -> int:
    """Exact floor(log2(num/den)): the unique k with 2^k <= num/den < 2^(k+1)."""
    def le(k: int) -> bool:
        return (den << k) <= num if k >= 0 else (num << -k) >= den
    k = 0
    while le(k + 1):
        k += 1
    while not le(k):
        k -= 1
    return k


def main() -> int:
    rnd = random.Random(42)
    boundary = [v for e in range(0, 41) for d in (-1, 0, 1)
                if (v := (1 << e) + d) >= 1]
    pool = boundary + [1 + rnd.randrange(1 << 50) for _ in range(400)]
    cases = [(rnd.choice(pool), rnd.choice(pool)) for _ in range(5000)]
    cases += [(1, 1), (1, 2 ** 61), (2 ** 61, 1)]
    con = duckdb.connect()
    vals = ", ".join(f"({n}, {d})" for n, d in cases)
    sql = dsir_sql.render("flog2DuckSql", num="num", den="den")
    got = con.execute(
        f"SELECT {sql} FROM (VALUES {vals}) t(num, den)").fetchall()
    bad = [(c, g[0], ref(*c)) for c, g in zip(cases, got) if g[0] != ref(*c)]
    if bad:
        print(f"FAIL: {len(bad)}/{len(cases)} mismatches, e.g. {bad[:5]}")
        return 1
    print(f"PASS: {len(cases)}/{len(cases)} exact (SQL extracted from "
          f"{dsir_sql.DSIR_SCALA.name})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
