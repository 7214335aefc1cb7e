package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Literal-argument extraction shared by every place custom functions
  * are registered (GraftExtensions injection + the session-registry
  * route in GraftFunctions.register): ONE definition of "a literal int
  * / string-array argument", with range checks and readable errors, so
  * the two registration paths cannot drift in argument semantics. */
object ExprLits {

  /** Evaluate a foldable integral argument with a clear error. */
  def constInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn expects a literal integer")
    val long = e.eval(null) match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long    => l.longValue()
      case s: java.lang.Short   => s.longValue()
      case b: java.lang.Byte    => b.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal integer, got $other")
    }
    // range-check BEFORE narrowing: a long literal must not silently
    // wrap into a wrong small value
    require(long >= Int.MinValue && long <= Int.MaxValue,
      s"$fn: argument $long out of Int range")
    long.toInt
  }

  /** Evaluate a foldable string-array argument (e.g. `array('a','b')`). */
  def constStrings(e: Expression, fn: String): Seq[String] = {
    require(e.foldable, s"$fn expects a literal array of strings")
    val v = e.eval(null)
    require(v != null, s"$fn: vocabulary array must not be NULL")
    v.asInstanceOf[ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map { s =>
        require(s != null, s"$fn: vocabulary entries must not be NULL")
        s.asInstanceOf[UTF8String].toString
      }.toSeq
  }
}
