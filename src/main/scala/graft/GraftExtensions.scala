package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.call_function
import graft.functions.{CosineSimilarity, KmvSketch}

/** Session extension registering graft's native Catalyst expressions.
  * Install via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. `Graft.install`
  * registers at runtime on an existing session (same registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(Graft.cosineSimDescriptor)
    ext.injectFunction(Graft.kmvSketchDescriptor)
  }
}

object Graft {

  private[graft] val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim expects exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  private[graft] val kmvSketchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_sketch"),
    new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "kmv_sketch expects (hash_col, k)")
      val k = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"kmv_sketch k must be an integer literal, got $other")
      }
      KmvSketch(children.head, k)
    })

  /** Runtime registration on an existing session (idempotent). */
  def install(spark: SparkSession): SparkSession = {
    Seq(cosineSimDescriptor, kmvSketchDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    graft.similarity.SimilarityOps.nativeCosineEnabled = true
    spark
  }

  /** Column-level API for the native expression; requires `install`
    * (or the extension) on the session that runs the plan.
    */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** KMV distinct-count sketch over a pre-hashed bigint column. */
  def kmvSketch(hashed: Column, k: Int): Column =
    call_function("kmv_sketch", hashed, org.apache.spark.sql.functions.lit(k))
}
