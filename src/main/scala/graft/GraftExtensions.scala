package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import graft.functions.CosineSimilarity

/** Session extension registering graft's native Catalyst expressions.
  * Install via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. `Graft.install`
  * registers at runtime on an existing session (same registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(Graft.cosineSimDescriptor)
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

  /** Runtime registration on an existing session (idempotent). */
  def install(spark: SparkSession): SparkSession = {
    val (id, info, builder) = cosineSimDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    graft.similarity.SimilarityOps.nativeCosineEnabled = true
    spark
  }

  /** Column-level API for the native expression; requires `install`
    * (or the extension) on the session that runs the plan.
    */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
