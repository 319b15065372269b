package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Build-enforces tools/check_oracle_literals.py — no oracle-SQL
  * literal may shadow a named Scala constant (the q270-modulus drift
  * class: `val M = 1L << 30` on the Scala side, a hand-copied
  * `1073741824` in the DuckDB oracle, silently diverging the day the
  * constant moves). The driver re-runs the same tool standalone; this
  * spec makes the repo's own `sbt test` red the moment a new mirror
  * lands. */
class OracleLiteralLintSpec extends AnyFunSuite {

  test("zero oracle-SQL literals shadow a named Scala constant") {
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/check_oracle_literals.py"))
      .!(ProcessLogger(l => { out.append(l).append('\n'); () }))
    assert(code == 0,
      s"tools/check_oracle_literals.py failed:\n$out")
  }
}
