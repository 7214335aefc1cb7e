package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable rounding: `round(x, 4)` on a double disagrees
  * between Spark and DuckDB when x sits on a decimal half (each engine
  * decides ties on its own decimal rendering of the SAME double).
  * `floor(x*1e4 + 0.5)/1e4` is pure double arithmetic — two engines
  * computing bit-identical x produce bit-identical results. Used on
  * every double that feeds the oracle hash in the text/similarity
  * queries; the SQL side uses [[StableRound.sql4]] verbatim. */
object StableRound {
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
  def sql4(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000"
}
