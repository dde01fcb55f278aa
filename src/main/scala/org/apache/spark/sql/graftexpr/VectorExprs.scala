package org.apache.spark.sql
package graftexpr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity kernels — the hot inner
  * loops of the LSH/ANN queries. These beat the `functions._` compositions
  * they replace because they run one fused primitive loop per row pair with
  * no intermediate array allocation:
  *
  *   - `jaccardCount` replaces size(array_intersect(a,b)) twice — the
  *     dominant cost of LSH candidate verification (array_intersect builds
  *     and materializes the intersection array; we only need its size);
  *   - `cosineSim` replaces three aggregate(zip_with(...)) passes with one
  *     loop accumulating dot, |a|² and |b|² together.
  *
  * Both implement `doGenCode` so they stay inside whole-stage codegen, and
  * both accumulate in element order, bit-identical to the DuckDB oracle
  * formulas (list_reduce over list_zip).
  */
object VectorExprs {

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def jaccardSim(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))

  /** Requires both arrays SORTED ascending + distinct (sort once per row
    * upstream, merge per pair). */
  def jaccardSortedSim(a: Column, b: Column): Column =
    Bridge.column(JaccardSortedSim(Bridge.expression(a), Bridge.expression(b)))
}

/** cos(a, b) over array<float> with double accumulation in element order. */
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Jaccard similarity of two distinct bigint arrays: |a∩b| counted through
  * a primitive open-addressing probe ([[JaccardKernel]]) — no boxing, no
  * intersection array. Codegen calls the static kernel directly, so the
  * whole loop is JIT-compiled primitive code.
  */
final case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.JaccardKernel.jaccard($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Jaccard over SORTED distinct bigint arrays: two-pointer merge, O(n+m)
  * with zero allocation per pair — the cheapest possible verification
  * kernel when the signature table is sorted once upstream.
  */
final case class JaccardSortedSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.JaccardKernel.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedSim =
    copy(left = l, right = r)
}

/** Primitive long-set intersection kernel: power-of-two open addressing
  * with linear probing, no boxing. Inputs are distinct-element arrays.
  */
object JaccardKernel {

  /** Two-pointer merge intersection over sorted distinct arrays. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val nx = a.numElements()
    val ny = b.numElements()
    if (nx == 0 && ny == 0) return 1.0
    if (nx == 0 || ny == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter).toDouble
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val nx = a.numElements()
    val ny = b.numElements()
    if (nx == 0 && ny == 0) return 1.0 // both empty: identical sets
    if (nx == 0 || ny == 0) return 0.0
    var cap = 4
    while (cap < nx * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var i = 0
    while (i < nx) {
      val x = a.getLong(i)
      var h = mix(x) & mask
      while (used(h) && keys(h) != x) h = (h + 1) & mask
      keys(h) = x
      used(h) = true
      i += 1
    }
    var inter = 0
    i = 0
    while (i < ny) {
      val x = b.getLong(i)
      var h = mix(x) & mask
      while (used(h) && keys(h) != x) h = (h + 1) & mask
      if (used(h)) inter += 1
      i += 1
    }
    inter.toDouble / (nx + ny - inter).toDouble
  }

  @inline private def mix(x: Long): Int = {
    val h = x * -7046029254386353131L // 0x9E3779B97F4A7C15
    ((h ^ (h >>> 32)) & 0x7fffffff).toInt
  }
}
