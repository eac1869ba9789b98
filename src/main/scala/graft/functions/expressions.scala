package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot loops (SURVEY.md
  * §2.8). Spark's higher-order array functions (`transform`/`aggregate`/
  * `zip_with`) are `CodegenFallback` — one of them in a projection drops
  * the whole stage out of whole-stage codegen and evaluates per-element
  * through the interpreter. These expressions generate a tight Java loop
  * instead, keeping the stage inside WSCG, while performing EXACTLY the
  * same IEEE double operations in the same order as both the HOF
  * formulation and the DuckDB oracle — bit-identical results, ~50×
  * cheaper per pair.
  */

/** Sequential dot product of two array<double> columns (no nulls inside
  * the arrays; shorter array bounds the loop). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cast an array<float> to array<double> in one generated loop (the
  * `transform(v, _.cast(double))` HOF equivalent, WSCG-friendly). */
case class FloatArrayToDouble(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_to_double"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getFloat(i).toDouble; i += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (double) $a.getFloat($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatArrayToDouble =
    copy(child = newChild)
}

/** The engine's stable 60-bit hash (first 15 hex chars of md5 — see
  * [[Hashing]]) as a single native expression: no hex-string
  * intermediate, one MD5 over the UTF-8 bytes, big-endian first 8 bytes
  * shifted right 4 bits. Bit-identical to the composed
  * `conv(substr(md5(x),1,15),16,10)` and to the DuckDB oracle. */
case class StableHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(a: Any): Any =
    StableHash60.hash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StableHash60.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): StableHash60 =
    copy(child = newChild)
}

/** 60-bit SimHash over an array of 60-bit token hashes: bit b of the
  * result is set iff a strict majority of tokens have bit b set (ties →
  * 0). One generated call per document instead of a 60-iteration
  * interpreted `aggregate(filter(...))` chain — same integer math. */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(a: Any): Any =
    SimHashUtil.simhash60(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashUtil.simhash60($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHashUtil {
  /** Static entry point shared by interpreted eval and generated code. */
  def simhash60(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 60) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var v = 0L
    var b = 0
    while (b < 60) { if (2 * counts(b) > n) v |= 1L << b; b += 1 }
    v
  }
}

object StableHash60 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
