package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with / aggregate) — stays
  * inside whole-stage codegen, no UDFs, no serialization boundary.
  *
  * All math is done in double after an explicit element cast so that
  * the DuckDB oracle (which computes over DOUBLE[] after the same
  * cast) folds the identical IEEE sequence.
  */
object VectorFunctions {

  /** Elementwise cast to double. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold dot product of two double arrays, via the
    * codegen'd [[DotProduct]] expression (same fold order as the HOF
    * formulation and DuckDB's list_dot_product).
    */
  def dot(a: Column, b: Column): Column =
    GraftExprBridge.toColumn(
      DotProduct(GraftExprBridge.toExpr(a), GraftExprBridge.toExpr(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays (0 when either is a zero
    * vector).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }
}
