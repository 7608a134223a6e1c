package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler(a, b)` — Jaro–Winkler similarity as a native Catalyst
  * expression: whole-stage codegen emits one static call into the tight
  * two-pass char-array loop below (no UDF boxing, no codegen fence), the
  * same tier-(b) path as `hamming64`. Semantics follow the standard
  * definition DuckDB's `jaro_winkler_similarity` implements (pinned
  * empirically in JaroWinklerSpec): match window `max(|a|,|b|)/2 − 1`,
  * half-counted transpositions, Winkler prefix boost (≤4 chars, p = 0.1)
  * applied only when the Jaro score exceeds 0.7, and 0.0 when either input
  * is empty.
  *
  * Characters are compared as UTF-16 code units (Java String), which
  * agrees with DuckDB's byte-level comparison for ASCII inputs — the only
  * inputs the oracle-checked query feeds it. Supplementary-plane text
  * would count surrogate pairs as two units; normalize or restrict to BMP
  * if that ever matters.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (STRING, STRING), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry point shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.toString, b.toString)

  private[graft] def sim(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var halfT2 = 0 // twice the transposition count (mismatched match pairs)
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halfT2 += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / len1 + m / len2 + (m - halfT2 / 2.0) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxP = math.min(4, math.min(len1, len2))
      while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Column-API form (registers on first use in the active session). */
  def jaroWinkler(a: Column, b: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("jaro_winkler", a, b)
  }

  /** Register `jaro_winkler` so `spark.sql` / `expr` resolve it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
}
