package graft.functions

/** THE grid-rounding function for every engine-side iterative loop
  * (PageRank both tiers, HITS both tiers): HALF_UP on the SHORTEST
  * decimal representation (`BigDecimal.valueOf`), never the exact
  * binary expansion (`new BigDecimal`).
  *
  * The two differ exactly when the shortest repr lands ON a grid
  * halfway while the binary value sits just below it (0.0833333335 at
  * 1e-9) — and Spark's `round()`, DuckDB's `round()` and scala
  * `BigDecimal` all use valueOf semantics, so any loop rounding with
  * the binary expansion desynchronizes from its oracle AND from the
  * DataFrame tier (caught by scalacheck in round 4;
  * HitsRoundingRegressionSpec pins the failing graph). One shared
  * helper so the fix can never fragment across the three loops again.
  */
object GridRound {
  def fn(roundTo: Int): Double => Double =
    if (roundTo < 0) identity
    else v => java.math.BigDecimal.valueOf(v)
      .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
}
