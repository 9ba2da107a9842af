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
  /** Σ aᵢ·bᵢ accumulated in double, left-to-right — fused codegen
    * expression (see org.apache.spark.sql.graft.VecDot); bit-identical
    * to the HOF formulation
    * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _+_)`
    * but ~orders faster (whole-stage codegen, no temp array).
    */
  def dotd(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VecExpressions.vec_dot(a, b)

  def l2norm(a: Column): Column = sqrt(dotd(a, a))

  def cosine(a: Column, b: Column): Column = dotd(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine rounded to 5 decimals — the engine's canonical score. */
  def cosine5(a: Column, b: Column): Column = round(cosine(a, b), 5)
}
