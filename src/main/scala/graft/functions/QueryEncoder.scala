package graft.functions

import org.apache.spark.sql.SparkSession

/** The text→embedding plug point — the single seam standing in for the
  * reference's sentence-transformer call (reference app.py:169-171,
  * `model.encode(query)`): production wires a real encoder (an
  * inference service client, an ONNX runtime, …) by naming its class
  * in `spark.graft.encoder.class`; tests and demos wire a
  * deterministic fake. Operators never hard-code an encoder — the
  * raw-text front doors resolve it here, so swapping models touches
  * configuration, not operator code.
  *
  * Implementations need a public no-arg constructor; encode() runs on
  * the DRIVER (one query string per search — the embedding then ships
  * to executors as a plan literal, exactly like the demo query
  * vector), so the implementation does not need to be serializable.
  */
trait QueryEncoder {
  def encode(text: String): Array[Float]
}

object QueryEncoder {

  /** The configured encoder, if any (`spark.graft.encoder.class`). */
  def resolve(spark: SparkSession): Option[QueryEncoder] =
    spark.conf.getOption("spark.graft.encoder.class").map { cn =>
      Class.forName(cn).getDeclaredConstructor().newInstance()
        .asInstanceOf[QueryEncoder]
    }

  /** The configured encoder, or a hard error naming the conf key —
    * a raw-text search without an encoder is a wiring bug, not a
    * fallback case.
    */
  def required(spark: SparkSession): QueryEncoder =
    resolve(spark).getOrElse(throw new IllegalStateException(
      "no query encoder configured: set spark.graft.encoder.class to a " +
        "QueryEncoder implementation with a no-arg constructor"))
}
