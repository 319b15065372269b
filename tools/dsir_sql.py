"""Shared runtime-extraction of DuckDB SQL literals from Dsir.scala.

Both property sweeps (check_flog2.py, check_dsir_sql.py) validate the
SQL text the engine actually ships, so they extract it from the Scala
source instead of duplicating it — and they share THIS module instead
of duplicating the extractor. A change to the literal shape in
Dsir.scala fails both sweeps in one place.
"""
import pathlib
import re

DSIR_SCALA = pathlib.Path(__file__).resolve().parent.parent / \
    "src" / "main" / "scala" / "graft" / "operators" / "Dsir.scala"


def source() -> str:
    return DSIR_SCALA.read_text()


def uniform_bits() -> int:
    """The ResampleUniformBits constant, read from the source so the
    sweeps' references derive from the same value the engine uses."""
    m = re.search(r"val ResampleUniformBits\s*=\s*(\d+)", source())
    if not m:
        raise SystemExit(
            f"FAIL: could not read ResampleUniformBits from {DSIR_SCALA}")
    return int(m.group(1))


def extract(defname: str) -> str:
    """The s\"\"\"...\"\"\" literal body of `def <defname>` in Dsir.scala."""
    m = re.search(
        r"def " + re.escape(defname) + r'\([^)]*\)\s*:\s*String\s*=\s*s"""(.*?)"""',
        source(), re.DOTALL)
    if not m:
        raise SystemExit(f"FAIL: could not extract {defname} from {DSIR_SCALA}")
    return m.group(1)


def render(defname: str, **args: str) -> str:
    """Extract and substitute: constant interpolations first (derived
    from ResampleUniformBits, exactly as the Scala interpolator does),
    then the named string parameters. Fails loudly on any leftover
    interpolation so a new `$x` in the literal cannot pass silently."""
    bits = uniform_bits()
    out = extract(defname)
    out = out.replace("${1L << ResampleUniformBits}", str(1 << bits))
    out = out.replace("$ResampleUniformBits", str(bits))
    for name, frag in args.items():
        out = out.replace("$" + name, frag)
    if "$" in out:
        raise SystemExit(
            f"FAIL: unexpected interpolation left in {defname}: {out}")
    return out
