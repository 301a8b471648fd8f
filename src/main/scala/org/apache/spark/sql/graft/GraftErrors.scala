package org.apache.spark.sql.graft

import org.apache.spark.QueryContext
import org.apache.spark.sql.errors.QueryExecutionErrors

/** Bridge into Spark's error factories (which are `private[sql]`) so
  * graft's native expressions raise the SAME error classes as the
  * built-ins they mirror — the standard extension-library shim pattern
  * (a library-private object placed in Spark's namespace; Delta and
  * other Spark extensions do the same for exactly this reason). */
object GraftErrors {
  /** The error ANSI `Divide` raises on a zero divisor: a
    * `SparkArithmeticException` with error class DIVIDE_BY_ZERO. */
  def divideByZeroError(context: QueryContext): ArithmeticException =
    QueryExecutionErrors.divideByZeroError(context)
}
