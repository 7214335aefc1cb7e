package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns.
  * Pure codegen'd built-ins (`zip_with`/`aggregate`) — no UDF, no
  * shuffle; computed in double precision with left-to-right summation
  * so the DuckDB oracle (same order, same doubles) agrees to the last
  * ulp. */
object VectorFunctions {

  /** Cast float vector to double for stable cross-engine arithmetic. */
  def as_double(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2_norm(a: Column): Column = sqrt(dot(a, a))

  /** Native codegen'd kernel ([[CosineSimilarity]]); same arithmetic
    * order as the HOF formulation it replaced, so oracle hashes are
    * unchanged. Non-float/double numeric arrays are widened to
    * array<double> by the analyzer (ImplicitCastInputTypes on the
    * expression), so this works on unresolved `col(...)` inputs too. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(CosineSimilarity(expression(a), expression(b)))
  }

  def l2_distance(a: Column, b: Column): Column = {
    val d = zip_with(as_double(a), as_double(b), (x, y) => x - y)
    sqrt(aggregate(d, lit(0.0), (acc, v) => acc + v * v))
  }
}
