package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.VecDot

/** Session extension exposing the engine's custom expressions to SQL:
  * `SELECT vec_dot(a.embedding, b.embedding) FROM ...`.
  *
  * Register at session build time
  * (`SparkSession.builder().withExtensions(new GraftExtensions)`) or
  * post-hoc on a live session via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
}

object GraftExtensions {
  private val vecDotDescriptor = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => VecDot(children(0), children(1)))

  /** Idempotent registration on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
}
