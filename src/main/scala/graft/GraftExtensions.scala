package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.VecDot

/** Session extension exposing the engine's vector kernels to SQL:
  * `SELECT vec_dot(a.embedding, b.embedding) FROM ...`, plus
  * `vec_norm(v)` and `vec_cosine(a, b)` composed from the same codegen
  * expression (one kernel, three SQL names — everything stays inside
  * whole-stage codegen).
  *
  * Register at session build time
  * (`SparkSession.builder().withExtensions(new GraftExtensions)`) or
  * post-hoc on a live session via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}

  private def norm(v: Expression): Expression = Sqrt(VecDot(v, v))
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "vec_norm" -> (es => norm(es(0))),
    "vec_cosine" -> (es => Divide(VecDot(es(0), es(1)), Multiply(norm(es(0)), norm(es(1))))))

  private val descriptors = builders.map { case (name, build) =>
    (new FunctionIdentifier(name), new ExpressionInfo(classOf[VecDot].getName, name), build)
  }

  /** Idempotent registration on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, build, "scala_udf")
    }
}
