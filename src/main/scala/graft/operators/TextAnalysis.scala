package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for corpus curation at scale: language ID,
  * quality scoring, token statistics, content fingerprinting. All are
  * narrow per-row transforms (no shuffle) built from codegen'd
  * `functions._` — they stream through a 100 TB scan at IO speed.
  */
object TextAnalysis {

  /** Marker tokens per language, chosen as the most over-represented
    * tokens per class in the synthetic corpus. Deterministic heuristic
    * classifier (the real-world analog is a char-n-gram profile à la
    * CLD; the operator shape — score per class, argmax with a fixed
    * tie-break order — is identical).
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("order", "window", "table", "hash"),
    "de" -> Seq("customer", "big", "row", "part"),
    "fr" -> Seq("query", "scan", "data", "batch"),
    "es" -> Seq("agg", "slow", "merge", "value"),
    "zh" -> Seq("join", "the", "fast", "dup"))

  private def markerCount(toks: Column, ms: Seq[String]): Column =
    size(filter(toks, t => t.isin(ms.map(lit): _*)))

  /** Language ID: per-language marker-token occurrence counts, argmax
    * with fixed precedence (en > de > fr > es > zh on ties).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = Tables.documents(spark, dir).select(
      col("doc_id") +: col("lang") +:
        markers.map { case (l, ms) => markerCount(toks, ms).as(s"s_$l") }: _*)
    val langs = markers.map(_._1)
    val pred = langs.foldRight(lit(langs.last)) { case (l, els) =>
      val ge = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduce(_ && _)
      when(ge, lit(l)).otherwise(els)
    }
    scored.select(col("doc_id"), pred.as("pred_lang"), col("lang"),
        (pred === col("lang")).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Text normalization — the reference's preprocessing step before
    * TF-IDF fitting (lowercase + whitespace collapse, reference
    * app.py's lowercased combined_text). Narrow codegen'd transform;
    * `\s+` means the same under Java regex and RE2, so the result is
    * engine-portable.
    */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("norm_text"),
        length(col("text")).cast("long").as("raw_len"))
      .withColumn("norm_len", length(col("norm_text")).cast("long"))
      .orderBy(col("doc_id"))

  /** Stopword list shared by [[quality]] and
    * [[Curation.curatePipeline]]'s gate. */
  private[operators] val stopwords: Seq[String] = Seq("the", "a")

  /** Adds the token/quality columns (n_tok, n_types, n_stop, quality)
    * to a frame with a `text` column — ONE definition of the score so
    * [[quality]] and [[Curation.curatePipeline]] can never drift apart
    * (both have DuckDB oracles that must match this exact arithmetic).
    * The score is an exact integer ratio — see [[quality]]'s notes.
    */
  private[operators] def withQualityCols(df: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    df.withColumn("n_tok", size(toks))
      .withColumn("n_types", size(array_distinct(toks)))
      .withColumn("n_stop", size(filter(toks, t => t.isin(stopwords.map(lit): _*))))
      // 0.4·min(tok,100)/100 + 0.3·types/tok + 0.3·(1 − stop/tok)
      // as one integer ratio over denominator 500·tok
      .withColumn("quality",
        (lit(2) * least(col("n_tok"), lit(100)) * col("n_tok")
          + lit(150) * col("n_types")
          + lit(150) * (col("n_tok") - col("n_stop")))
          / (lit(500) * col("n_tok")))
  }

  /** Quality scoring: length, lexical diversity (type-token ratio),
    * stopword ratio, blended into a 0-1 quality score.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    withQualityCols(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        col("n_tok").cast("long").as("n_tokens"),
        col("n_types").cast("long").as("n_types"),
        // exact integer ratios (no rounding): both engines produce the
        // bit-identical nearest double of the same rational number,
        // where round()-of-a-computed-double can differ on decimal ties
        (col("n_types") / col("n_tok")).as("ttr"),
        (col("n_stop") / col("n_tok")).as("stop_ratio"),
        col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens, bigrams, chars, plus a BPE-ish
    * sub-token estimate (ceil(chars/4) — the common 4-chars-per-token
    * heuristic) per document.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (size(toks) - 1).cast("long").as("n_bigrams"),
        length(col("text")).cast("long").as("n_chars"),
        ceil(length(col("text")) / lit(4.0)).cast("long").as("est_subtokens"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing fingerprints (rolling-hash document signatures — the
    * MOSS scheme): hash every char k-gram, then keep each window-of-w
    * minimum. Near-identical documents share most selected
    * fingerprints even under edits, which is what makes winnowing the
    * standard plagiarism/near-dup signature. Shape at scale: k-gram
    * explode is a narrow transform, the min runs as a doc-partitioned
    * sliding window (never global), and the signature aggregate
    * combines map-side. Windows are taken at every k-gram position
    * (tail windows shorter than w included) — deterministic and
    * engine-portable, which the oracle checks.
    */
  def winnowFingerprint(spark: SparkSession, dir: String, k: Int = 8, w: Int = 4): DataFrame =
    winnowed(spark, dir, k, w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kgrams"),
        countDistinct(col("sel")).as("n_fps"),
        min(col("sel")).as("min_fp"))
      .orderBy(col("doc_id"))

  /** The per-position winnowing frame (doc_id, pos, sel) —
    * [[winnowFingerprint]] aggregates it per document;
    * [[Dedup.substringDedup]] joins documents on shared selected
    * fingerprints.
    */
  private[operators] def winnowed(spark: SparkSession, dir: String, k: Int, w: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        posexplode(when(length(col("text")) >= k,
          expr(s"transform(sequence(0, length(text) - $k), i -> substring(text, i + 1, $k))"))
          .otherwise(array().cast("array<string>"))))
      .toDF("doc_id", "pos", "g")
      .select(col("doc_id"), col("pos"), substring(md5(col("g")), 1, 8).as("hh"))
      .withColumn("sel", min(col("hh")).over(win))
  }

  /** Content fingerprinting: md5 content hash, a 64-bit prefix
    * fingerprint, and the distinct-shingle count (winnowing-style
    * signature size).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(Tables.documents(spark, dir), 5)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        substring(md5(col("text")), 1, 16).as("fp64"))
      .join(sh, Seq("doc_id"), "left")
      .withColumn("n_shingles", coalesce(col("n_shingles"), lit(0L)))
      .orderBy(col("doc_id"))
  }
}
