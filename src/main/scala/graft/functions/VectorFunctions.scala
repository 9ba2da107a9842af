package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * Mirrors the reference's NumPy dot-product scoring
  * (reference app.py:181 `prod_emb[cand] @ qv[0]`) as Catalyst
  * higher-order functions: codegen-friendly, no UDF serialization, and
  * executed columnar-batch-at-a-time inside whole-stage codegen.
  *
  * All arithmetic is promoted to double BEFORE accumulation so results
  * are bit-stable across engines (the DuckDB oracle casts to DOUBLE[]
  * the same way); scores surfaced to users are rounded to 5 decimals
  * so top-k order is reproducible.
  */
object VectorFunctions {
  /** Σ aᵢ·bᵢ accumulated in double, left-to-right. */
  def dotd(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dotd(a, a))

  def cosine(a: Column, b: Column): Column = dotd(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine rounded to 5 decimals — the engine's canonical score. */
  def cosine5(a: Column, b: Column): Column = round(cosine(a, b), 5)
}
