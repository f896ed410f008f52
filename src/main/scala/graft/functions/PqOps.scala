package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Product-quantization primitives as native Catalyst expressions —
  * the per-row hot path of the PQ/IVF-PQ gates.
  *
  * The higher-order encode (`transform(sequence, s => aggregate(
  * zip_with(...), minBy))`) is correct but interpreted: for m=8
  * subspaces × ks=16 codewords × dsub=8 dims it evaluates ~2k lambda
  * closures and allocates ~130 intermediate arrays PER ROW. These
  * expressions compile the same arithmetic to tight primitive loops
  * (whole-stage codegen), preserving bit-identity with the HOF form
  * and the DuckDB oracle:
  *
  *  - squared-diff accumulation is the SAME sequential left-to-right
  *    double fold as `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)),0.0,+)`;
  *  - the nano-unit quantization replicates Spark's `round(x, 0)` on
  *    DoubleType exactly: `BigDecimal.valueOf(x).setScale(0, HALF_UP)`
  *    then the integral double casts to long;
  *  - codeword selection keeps the FIRST strict minimum (ties resolve
  *    to the smaller codeword id), the fold's `when(d < acc.d, e)`
  *    contract;
  *  - a vector too short for a subspace slice leaves that subspace's
  *    candidates null in the HOF form, so no candidate wins and the
  *    zero struct's id 0 survives — the loops reproduce that by
  *    skipping the candidate scan when the slice would run past the
  *    vector (never reachable on the fixed-dim embeddings corpus).
  *
  * PqEncodeSpec pins the value identity by running both forms over the
  * real embeddings tables and asserting per-row equality.
  */
object PqOps {
  import org.apache.spark.sql.graftbridge.Bridge

  /** codes(s) = argmin over the subspace-s codebook of the quantized
    * squared distance between v's s-th slice and the codeword. */
  def encode(v: Column, cb: Column): Column =
    Bridge.column(PqEncode(Bridge.expression(v), Bridge.expression(cb)))

  /** ADC lookup sum: Σ_s tab(s)(codes(s)) in exact longs. */
  def adc(codes: Column, tab: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(tab)))

  /** Spark `round(x, 0)` on a double, then the double→long cast —
    * shared by eval and the generated code (one definition, zero
    * drift). Non-negative finite inputs here, but the call replicates
    * Spark semantics regardless. */
  def roundNanoToLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
}

/** `PqEncode(v: array<double>, cb: array<array<array<double>>>)` →
  * `array<int>` of per-subspace nearest-codeword ids. Shapes are read
  * from the codebook itself (m = |cb|, ks = |cb(s)|, dsub = |cb(s)(i)|),
  * matching the HOF form the ks/m/dsub literals parameterized. */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<array<double>>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val m = cb.numElements()
    val codes = new Array[Int](m)
    val vn = v.numElements()
    var s = 0
    while (s < m) {
      val cvs = cb.getArray(s)
      val ks = cvs.numElements()
      var bestD = Long.MaxValue
      var bestI = 0
      var i = 0
      while (i < ks) {
        val cv = cvs.getArray(i)
        val dsub = cv.numElements()
        val off = s * dsub
        if (off + dsub <= vn) { // short slice ⇒ null distance ⇒ skip
          var acc = 0.0
          var j = 0
          while (j < dsub) {
            val d = v.getDouble(off + j) - cv.getDouble(j)
            acc += d * d
            j += 1
          }
          val dn = PqOps.roundNanoToLong(acc * 1e9)
          if (dn < bestD) { bestD = dn; bestI = i }
        }
        i += 1
      }
      codes(s) = bestI
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val m = ctx.freshName("m")
      val vn = ctx.freshName("vn")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val codes = ctx.freshName("codes")
      val cvs = ctx.freshName("cvs")
      val cv = ctx.freshName("cv")
      val ks = ctx.freshName("ks")
      val dsub = ctx.freshName("dsub")
      val off = ctx.freshName("off")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val dn = ctx.freshName("dn")
      s"""
        int $m = $cb.numElements();
        int $vn = $v.numElements();
        int[] $codes = new int[$m];
        for (int $s = 0; $s < $m; $s++) {
          org.apache.spark.sql.catalyst.util.ArrayData $cvs = $cb.getArray($s);
          int $ks = $cvs.numElements();
          long $bestD = Long.MAX_VALUE;
          int $bestI = 0;
          for (int $i = 0; $i < $ks; $i++) {
            org.apache.spark.sql.catalyst.util.ArrayData $cv = $cvs.getArray($i);
            int $dsub = $cv.numElements();
            int $off = $s * $dsub;
            if ($off + $dsub <= $vn) {
              double $acc = 0.0;
              for (int $j = 0; $j < $dsub; $j++) {
                double $d = $v.getDouble($off + $j) - $cv.getDouble($j);
                $acc += $d * $d;
              }
              long $dn = graft.functions.PqOps.roundNanoToLong($acc * 1e9);
              if ($dn < $bestD) { $bestD = $dn; $bestI = $i; }
            }
          }
          $codes[$s] = $bestI;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `PqAdc(codes: array<int>, tab: array<array<long>>)` → long: the
  * asymmetric-distance lookup sum Σ_s tab(s)(codes(s)). Long addition
  * in ascending subspace order — exactly the HOF fold's order (and
  * order-free anyway in exact integers). */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<long>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tab = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0
    var acc = 0L
    while (s < m) {
      acc += tab.getArray(s).getLong(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tab) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
        int $m = $codes.numElements();
        long $acc = 0L;
        for (int $s = 0; $s < $m; $s++) {
          $acc += $tab.getArray($s).getLong($codes.getInt($s));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
