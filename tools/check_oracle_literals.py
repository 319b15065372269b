#!/usr/bin/env python3
"""Lint: no oracle-SQL literal may shadow a named Scala constant.

The bug class (hit twice: the q270 resample modulus, the q247 priority
modulus): an operator defines `val M = 1L << 30` and the DuckDB oracle
hand-copies `1073741824` — the two drift silently the day the constant
moves. The fix is interpolation (`% ${PrioritySample.M}`); this lint
keeps the repo at zero hand-copied mirrors so the fix class stays fixed.

Mechanics:
 1. Collect named numeric constants: every `val NAME = <numeric expr>`
    in src/main/scala/graft (object-level or local), where the
    initializer is built from integer literals with `<< * + - ()` only.
    Values below DISTINCTIVE are skipped — small values (16, 64, 100,
    10000-bp) appear everywhere legitimately and are interpolated by
    the existing per-query discipline; the silent-drift hazard is the
    long magic number nobody re-derives by eye.
 2. Scan the SQL string regions of src/main/scala/graft/queries/*.scala
    (triple-quoted blocks and "..."-quoted lines containing SQL) for
    raw decimal literals equal to any collected value, OUTSIDE ${...}
    interpolations.
 3. Report file:line for each hit; exit 1 on any.

Run: python3 tools/check_oracle_literals.py   (driver-re-runnable; no
Spark, no DuckDB — pure source lint).
"""
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src" / "main" / "scala" / "graft"

# Below this, literals are too common to attribute to one constant.
DISTINCTIVE = 100_000

VAL_RE = re.compile(
    r"\bval\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?::\s*[A-Za-z]+\s*)?=\s*([0-9()\sLl*+<\-]+?)\s*(?://.*)?$")
NUM_EXPR_RE = re.compile(r"^[0-9()\sLl*+<\-]+$")


def collect_constants():
    consts = {}
    for path in SRC.rglob("*.scala"):
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            m = VAL_RE.search(line)
            if not m:
                continue
            name, expr = m.group(1), m.group(2).strip()
            if not NUM_EXPR_RE.match(expr) or not re.search(r"\d", expr):
                continue
            py = expr.replace("L", "").replace("l", "")
            try:
                value = eval(py, {"__builtins__": {}}, {})  # digits/ops only
            except Exception:
                continue
            if isinstance(value, int) and abs(value) >= DISTINCTIVE:
                consts.setdefault(value, []).append(
                    f"{name} ({path.relative_to(ROOT)}:{lineno})")
    return consts


def strip_interpolations(text: str) -> str:
    """Blank out ${...} regions (nesting-aware) so interpolated
    constants are not flagged — interpolation IS the fix."""
    out, i, n = [], 0, len(text)
    while i < n:
        if text.startswith("${", i):
            depth, j = 1, i + 2
            while j < n and depth:
                if text[j] == "{":
                    depth += 1
                elif text[j] == "}":
                    depth -= 1
                j += 1
            out.append(" " * (j - i))
            i = j
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def main() -> int:
    consts = collect_constants()
    lit_re = re.compile(r"(?<![0-9A-Za-z_.])(\d{6,})(?![0-9A-Za-z_])")
    failures = []
    for path in (SRC / "queries").glob("*.scala"):
        text = strip_interpolations(path.read_text())
        for lineno, line in enumerate(text.splitlines(), 1):
            for m in lit_re.finditer(line):
                v = int(m.group(1))
                if v in consts:
                    failures.append(
                        f"{path.relative_to(ROOT)}:{lineno}: literal {v} "
                        f"shadows {'; '.join(consts[v])} — interpolate the "
                        "constant instead")
    if failures:
        print("\n".join(failures))
        print(f"\n{len(failures)} hand-copied constant mirror(s); "
              "interpolate via ${...}")
        return 1
    print(f"ok: {len(consts)} distinctive named constants, zero "
          "hand-copied mirrors in oracle/query SQL")
    return 0


if __name__ == "__main__":
    sys.exit(main())
