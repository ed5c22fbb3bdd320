package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused vector-distance Catalyst expression (SURVEY.md §4 item 2).
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`,
  * [[graft.functions.VectorFunctions]]) allocates an intermediate array per
  * row pair and walks it twice more for the norms; inside a k-NN join that
  * is the entire inner loop. This expression fuses dot product and norms
  * into ONE pass over the two arrays with primitive accumulators and
  * whole-stage codegen — no allocation, no lambda dispatch.
  *
  * Semantics match the HOF version bit-for-bit (sequential left-to-right
  * accumulation in element order, same IEEE ops), so swapping it into a
  * query changes no oracle result:
  *  - kinds: "cosine" → 1 − dot/(‖a‖·‖b‖) (zero norm → NaN),
  *    "cossim" → dot/(‖a‖·‖b‖) (the similarity itself, zero norm → NaN),
  *    "l2" → √Σ(aᵢ−bᵢ)², "negdot" → −Σaᵢbᵢ.
  *  - null array, length mismatch, or any null element → null
  *    (exactly what zip_with/aggregate produce).
  *  - accepts array<float> / array<double> on either side; floats widen.
  */
case class VectorDistance(left: Expression, right: Expression, kind: String)
    extends BinaryExpression {

  require(VectorDistance.Kinds.contains(kind),
    s"unknown distance kind '$kind' (expected one of ${VectorDistance.Kinds.mkString(", ")})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"vector_${kind}_distance"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      kind match {
        case "cosine" | "cossim" => dot += xv * yv; na += xv * xv; nb += yv * yv
        case "l2" => val d = xv - yv; dot += d * d
        case "negdot" => dot += xv * yv
      }
      i += 1
    }
    kind match {
      case "cosine" =>
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) Double.NaN else 1.0 - dot / denom
      case "cossim" =>
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) Double.NaN else dot / denom
      case "l2" => math.sqrt(dot)
      case "negdot" => -dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val anyNull = ctx.freshName("anyNull")
      val getX = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getY = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      val accumulate = kind match {
        case "cosine" | "cossim" => s"$dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;"
        case "l2" => s"double ${xv}d = $xv - $yv; $dot += ${xv}d * ${xv}d;"
        case "negdot" => s"$dot += $xv * $yv;"
      }
      val finish = kind match {
        case "cosine" =>
          s"""double ${na}denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
             |${ev.value} = (${na}denom == 0.0d) ? Double.NaN : 1.0d - $dot / ${na}denom;""".stripMargin
        case "cossim" =>
          s"""double ${na}denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
             |${ev.value} = (${na}denom == 0.0d) ? Double.NaN : $dot / ${na}denom;""".stripMargin
        case "l2" => s"${ev.value} = java.lang.Math.sqrt($dot);"
        case "negdot" => s"${ev.value} = -$dot;"
      }
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0d; double $na = 0.0d; double $nb = 0.0d;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    double $xv = $getX;
         |    double $yv = $getY;
         |    $accumulate
         |  }
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    $finish
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDistance =
    copy(left = newLeft, right = newRight)
}

object VectorDistance {
  val Kinds: Set[String] = Set("cosine", "cossim", "l2", "negdot")
}
