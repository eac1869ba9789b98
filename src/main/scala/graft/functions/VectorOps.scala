package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns.
  *
  * Backed by the native codegen expressions in
  * [[graft.functions.DotProduct]] etc. — NOT Spark's higher-order array
  * functions, which are `CodegenFallback` and would drop every pair-
  * scoring stage out of whole-stage codegen. The generated loops perform
  * the identical IEEE double operations in the identical sequential
  * order as the DuckDB oracle's `list_sum(list_transform(...))`, so
  * cosine values stay bit-identical across engines.
  */
object VectorOps {

  /** Cast an array<float> column to array<double> (exact widening). */
  def toDouble(v: Column): Column = column(FloatArrayToDouble(expression(v)))

  /** Dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Euclidean norm (sequential sum of squares, then sqrt). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (hot-path form: norms are
    * computed once per row, not once per pair). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
