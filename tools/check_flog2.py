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

The SQL text is EXTRACTED from the Scala source at runtime (the
flog2DuckSql interpolated-string literal in operators/Dsir.scala), so
the sweep always validates the spelling the engine actually ships —
a drift between the two files is impossible by construction.

Usage: python3 tools/check_flog2.py   (prints PASS/FAIL, exits nonzero on FAIL)
"""
import pathlib
import random
import re
import sys

import duckdb

DSIR_SCALA = pathlib.Path(__file__).resolve().parent.parent / \
    "src" / "main" / "scala" / "graft" / "operators" / "Dsir.scala"


def extract_flog2_duck_template() -> str:
    """Pull the s\"\"\"...\"\"\" literal out of def flog2DuckSql in the
    Scala source. Fails loudly if the definition moves or changes shape."""
    src = DSIR_SCALA.read_text()
    m = re.search(
        r'def flog2DuckSql\([^)]*\)\s*:\s*String\s*=\s*s"""(.*?)"""',
        src, re.DOTALL)
    if not m:
        raise SystemExit(
            f"FAIL: could not extract flog2DuckSql literal from {DSIR_SCALA}")
    return m.group(1)


def flog2_sql(num: str, den: str) -> str:
    tmpl = extract_flog2_duck_template()
    # Scala interpolates $num / $den; substitute the SQL fragments.
    out = tmpl.replace("$num", num).replace("$den", den)
    if "$" in out:
        raise SystemExit(
            "FAIL: unexpected interpolation left in flog2DuckSql literal: "
            + out)
    return out


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
    got = con.execute(
        f"SELECT {flog2_sql('num', 'den')} "
        f"FROM (VALUES {vals}) t(num, den)").fetchall()
    bad = [(c, g[0], ref(*c)) for c, g in zip(cases, got) if g[0] != ref(*c)]
    if bad:
        print(f"FAIL: {len(bad)}/{len(cases)} mismatches, e.g. {bad[:5]}")
        return 1
    print(f"PASS: {len(cases)}/{len(cases)} exact (SQL extracted from "
          f"{DSIR_SCALA.name})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
