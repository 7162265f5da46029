package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler string similarity —
  * the entity-resolution verifier for NAME-shaped strings (transposed
  * characters and shared prefixes score high where Levenshtein charges
  * full edits). Classic Winkler parameters, matching DuckDB's
  * `jaro_winkler_similarity` bit-for-bit (probed empirically): prefix
  * bonus 0.1·min(prefix, 4)·(1−j) applied only when j > 0.7; empty
  * input or zero matches → 0.0; the match window is
  * max(⌊max(|s|,|t|)/2⌋−1, 0).
  *
  * Codegen: one static call into [[Jw.sim]] from the generated code —
  * stays inside whole-stage codegen (no UDF SerDe, no virtual
  * dispatch), with the per-row char work in one JIT-friendly method.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Jw.sim(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Jw.sim($a.getBytes(), $b.getBytes())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

/** Static implementation (top-level object ⇒ static forwarder class,
  * callable from generated Java).
  *
  * Operates on UTF-8 BYTES, exactly like DuckDB's
  * `jaro_winkler_similarity` — multi-byte codepoints change match
  * windows and prefix lengths byte-wise on both engines identically
  * (a UTF-16 char comparison would diverge from the oracle on
  * non-ASCII input).
  */
object Jw {

  /** Convenience overload for JVM-string callers (tests, API layer). */
  def sim(s: String, t: String): Double =
    sim(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      t.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def sim(s: Array[Byte], t: Array[Byte]): Double = {
    val ls = s.length; val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val j0 = (md / ls + md / lt + (md - trans / 2.0) / md) / 3.0
    if (j0 > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(ls, lt))
      while (p < maxP && s(p) == t(p)) p += 1
      j0 + p * 0.1 * (1.0 - j0)
    } else j0
  }
}
