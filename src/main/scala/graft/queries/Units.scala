package graft.queries

/** Time-unit constants in MICROSECONDS, shared by the Scala side and
  * the interpolated oracle SQL of the window/bucket queries — one
  * definition per unit, zero hand-copied mirrors (the q270-modulus
  * rule, enforced by tools/check_oracle_literals.py: any oracle
  * literal equal to a named constant fails the lint, so unit
  * arithmetic must interpolate these). */
object Units {
  val HourUs: Long = 3600L * 1000000L
  val DayUs: Long = 86400L * 1000000L
  val Min5Us: Long = 300L * 1000000L
}
