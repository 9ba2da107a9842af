package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Language-metadata audit: the (declared, detected) confusion cells
    * where [[langId]]'s n-gram detector disagrees with the corpus's
    * `lang` column, with a witness doc id per cell. Mislabeled
    * language metadata silently routes documents through the wrong
    * curation filters — a pipeline wants this audit before trusting
    * the column for mixture weights or per-language quality gates.
    *
    * Scale shape: [[langId]]'s narrow scan + one map-side-combined
    * aggregate; output rows bounded by |langs|².
    */
  def langMismatch(spark: SparkSession, dir: String): DataFrame =
    langId(spark, dir).where(!col("correct"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"), col("pred_lang"))

  /** Zipf-law fit over the corpus vocabulary: least-squares slope of
    * ln(tf) on ln(rank) across the top-N terms. Natural text sits near
    * slope −1; a corpus whose slope collapses toward 0 (template spam)
    * or steepens sharply (tiny vocabulary, generated text) fails the
    * distributional sanity check before training sees it.
    *
    * Scale shape: one map-side-combined term count + TakeOrdered
    * top-N; the regression runs over those N rows only (single
    * bounded-width window, then one tiny aggregate). Same sklearn
    * tokenizer as the TF-IDF surface so vocab numbers line up across
    * queries.
    *
    * Determinism: recentered least squares (Σ(x−x̄)(y−ȳ)/Σ(x−x̄)²) +
    * signed-zero normalization (`+ 0.0`), the [[vocabHeaps]] rule — a
    * constant-tf vocabulary (template corpus) makes y constant and the
    * n·Σxy−ΣxΣy numerator a ±1e-14 cancellation residual whose
    * rounded sign (−0.0 vs +0.0) is an engine coin flip.
    */
  def vocabZipf(spark: SparkSession, dir: String, topN: Int = 100): DataFrame = {
    val top = Tables.documents(spark, dir)
      .select(explode(TextRetrieval.sklearnTokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term")).limit(topN)
    val w = Window.orderBy(col("tf").desc, col("term"))
    val xy = top.withColumn("rank", row_number().over(w))
      .select(log(col("rank")).as("x"), log(col("tf")).as("y"))
    val m = xy.agg(avg(col("x")).as("xb"), avg(col("y")).as("yb"))
    xy.crossJoin(broadcast(m))
      .agg(count(lit(1)).as("n"), first(col("xb")).as("xb"), first(col("yb")).as("yb"),
        sum((col("x") - col("xb")) * (col("y") - col("yb"))).as("sxy_c"),
        sum((col("x") - col("xb")) * (col("x") - col("xb"))).as("sxx_c"))
      .select(col("n").as("n_terms"),
        when(col("sxx_c") === 0, lit(null).cast("double"))
          .otherwise(round(col("sxy_c") / col("sxx_c"), 4) + lit(0.0)).as("slope"),
        when(col("sxx_c") === 0, lit(null).cast("double"))
          .otherwise(round(col("yb") - col("sxy_c") / col("sxx_c") * col("xb"), 4) + lit(0.0))
          .as("intercept"))
  }

  /** Per-source unigram KL divergence from the corpus distribution —
    * the distribution-shift score behind mixture decisions: a source
    * whose KL spikes writes in a different register (or is machine
    * noise) relative to the pool it's being mixed into.
    * KL(src ‖ corpus) = Σ_t p_t · ln(p_t/q_t) over the source's own
    * terms (p_t > 0 there, and q_t > 0 because the corpus contains the
    * source — no smoothing needed).
    *
    * Scale shape: one (source, term) count; corpus counts derive from
    * it by a second map-side-combined agg (the text is scanned ONCE);
    * the join back is term-keyed with one corpus row per term —
    * skew-safe like every single-row-build-side join; per-source
    * totals broadcast.
    */
  def sourceKl(spark: SparkSession, dir: String): DataFrame = {
    val srcTf = Tables.documents(spark, dir)
      .select(col("source"), explode(TextRetrieval.sklearnTokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val srcTot = srcTf.groupBy(col("source"))
      .agg(sum(col("tf")).as("t_src"), count(lit(1)).as("n_terms"))
    val corpTf = srcTf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val corpTot = corpTf.agg(sum(col("ctf")).as("t_corp"))
    srcTf.join(corpTf, "term")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpTot))
      .select(col("source"), col("t_src"), col("n_terms"),
        ((col("tf") / col("t_src")) *
          log((col("tf") / col("t_src")) / (col("ctf") / col("t_corp")))).as("contrib"))
      .groupBy(col("source"), col("t_src").as("n_tokens"), col("n_terms"))
      .agg(round(sum(col("contrib")), 4).as("kl"))
      .orderBy(col("source"))
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
  private[graft] def withQualityCols(df: DataFrame): DataFrame = {
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

  /** BPE-style pre-tokenization stats: the GPT-2-family regex split
    * (letter runs | single digits | single punctuation — the
    * Java∩RE2-portable core of the released pattern, digits split
    * singly exactly as GPT-2 does) plus a piece-length subtoken
    * estimate `Σ ceil(len/6)` (long words cost multiple merges — a
    * much closer token-budget proxy than [[tokenCount]]'s flat
    * chars/4). All counts are exact integers over the piece list —
    * `regexp_extract_all` + array ops, zero shuffles, one narrow
    * codegen'd scan — and the oracle re-runs the same pattern under
    * RE2, so engine/oracle regex drift fails the hash-match instead of
    * hiding.
    */
  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame = {
    val pieces = regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]|[^a-z0-9 \\t\\n\\r]"), lit(0))
    def firstBetween(lo: String, hi: String): Column => Column =
      x => substring(x, 1, 1).between(lit(lo), lit(hi))
    Tables.documents(spark, dir)
      .select(col("doc_id"), pieces.as("pieces"))
      .select(col("doc_id"),
        size(col("pieces")).cast("long").as("n_pieces"),
        size(filter(col("pieces"), firstBetween("a", "z"))).cast("long").as("n_alpha"),
        size(filter(col("pieces"), firstBetween("0", "9"))).cast("long").as("n_digit"),
        (size(col("pieces")) - size(filter(col("pieces"), firstBetween("a", "z")))
          - size(filter(col("pieces"), firstBetween("0", "9")))).cast("long").as("n_punct"),
        expr("aggregate(transform(pieces, x -> (length(x) + 5) div 6), 0L, (a, v) -> a + v)")
          .as("est_bpe"))
      .orderBy(col("doc_id"))
  }

  /** BPE merge LEARNING (Sennrich et al. 2016 §3.2 — the train side
    * of [[bpeTokenStats]]'s apply-side estimate): `rounds` greedy
    * merge steps over the corpus word-frequency table. Each round
    * counts every adjacent symbol pair (overlaps included, weighted
    * by word count — the subword-nmt counting rule), takes the argmax
    * with a fixed tie order (count DESC, then left/right symbol ASC),
    * and rewrites every vocabulary entry with the winning pair fused.
    * No end-of-word marker: merges are learned over in-word adjacency
    * only (documented divergence from the paper's `</w>` variant; the
    * learned table is equivalent modulo the final-position split).
    *
    * The merge rewrite is exactly TWO applications of
    * `replace(' '||seq||' ', ' a b ', ' ab ')` on the space-joined
    * symbol string. A single left-to-right non-overlapping replace
    * consumes the matched segment's trailing delimiter, so back-to-
    * back occurrences (`a b a b`) leave the second unfused; the
    * second pass fuses those stragglers. Equal-symbol runs keep a
    * deterministic mid-run singleton (five `a`s → `[aa, a, aa]`) —
    * a documented divergence from textbook run-greedy BPE. Java's
    * `String.replace` and DuckDB's `replace` implement the identical
    * consumption rule, so engine and oracle fuse the same by
    * construction; the spec re-derives rounds on the driver with
    * `String.replace` as a third implementation.
    *
    * Scale shape: ONE corpus scan builds the word-frequency table;
    * every round after that runs on the |V|-row vocabulary (capped at
    * `maxVocab` by count-desc/word-asc — the cap any 100 TB tokenizer
    * fit needs anyway), with a map-side-combined pair count, a 1-row
    * TakeOrdered argmax, and a narrow rewrite. Driver traffic is one
    * 3-column row per round. State is ScratchCache'd per round so the
    * DAG stays linear across rounds.
    */
  def bpeLearnMerges(spark: SparkSession, dir: String, rounds: Int = 8,
                     maxVocab: Int = 20000): DataFrame = {
    import spark.implicits._
    bpeState(spark, dir, rounds, maxVocab)._1
      .toDF("round", "lhs", "rhs", "pair_count", "merged")
      .orderBy(col("round"))
  }

  /** The shared BPE train loop: runs `rounds` greedy merge rounds and
    * returns (merge table, final (w, cnt, seq) vocabulary state) —
    * [[bpeLearnMerges]] serves the former, [[bpeApplyStats]] the
    * latter. Driver traffic is one 3-column argmax row per round.
    */
  private def bpeState(spark: SparkSession, dir: String, rounds: Int,
                       maxVocab: Int): (Seq[(Long, String, String, Long, String)], DataFrame) = {
    val words = Tables.documents(spark, dir)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxVocab)
    var vocab = graft.sources.ScratchCache.materialize(
      words.select(col("w"), col("cnt"),
        array_join(filter(split(col("w"), ""), x => x =!= ""), " ").as("seq")))
    val merges = Seq.newBuilder[(Long, String, String, Long, String)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = vocab
        .select(col("cnt"), split(col("seq"), " ").as("syms"))
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), (x, i) -> struct(x AS a, element_at(syms, i + 2) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, a, b, n, a + b))
        val fuse1 = s"replace(concat(' ', seq, ' '), ' ${a} ${b} ', ' ${a}${b} ')"
        val fuse2 = s"replace(concat(' ', trim($fuse1), ' '), ' ${a} ${b} ', ' ${a}${b} ')"
        vocab = graft.sources.ScratchCache.materialize(
          vocab.select(col("w"), col("cnt"), trim(expr(fuse2)).as("seq")))
        r += 1
      }
    }
    (merges.result(), vocab)
  }

  /** The APPLY side of [[bpeLearnMerges]]: tokenize the corpus with
    * the learned merge table and report the realized token budget —
    * per doc, word/token/char counts and the chars-per-token
    * compression the merges actually bought (vs [[bpeTokenStats]]'s
    * `ceil(len/6)` estimate). Each vocabulary word's token count is
    * just the symbol count of its final fused state, so application
    * is a word-keyed join — no per-doc re-segmentation. Words outside
    * the `maxVocab` training cap fall back to character tokens
    * (length(w)), the untrained-word worst case, exactly mirrored in
    * the oracle. Scale shape: the train loop's vocab-level rounds,
    * then one corpus tokenize scan + one vocab-keyed join (AQE
    * broadcast — the vocab is capped) + a per-doc map-side-combined
    * sum.
    */
  def bpeApplyStats(spark: SparkSession, dir: String, rounds: Int = 8,
                    maxVocab: Int = 20000): DataFrame = {
    val vocab = bpeState(spark, dir, rounds, maxVocab)._2
      .select(col("w"), size(split(col("seq"), " ")).cast("long").as("n_sym"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("w"))
      .join(vocab, Seq("w"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sym"), length(col("w")))).as("n_tokens"),
        sum(length(col("w"))).as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"), col("n_chars"),
        round(col("n_chars") / col("n_tokens"), 5).as("chars_per_token"))
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

  /** PII patterns shared by the engine and the DuckDB oracle — kept to
    * the regex subset Java and RE2 evaluate identically (no
    * backreferences, no lookaround, ASCII classes): emails, IPv4
    * addresses, long digit runs (phone/account numbers). Order
    * matters — emails first so their digits aren't half-eaten by the
    * number rule.
    */
  private[graft] val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("number", "\\d{6,}", "<NUM>"))

  /** Adds per-pattern match counts (n_email, n_ipv4, n_number) and the
    * redacted text to a frame with a `text` column — the PII scrub a
    * training-data pipeline runs before anything else ships. Counts
    * are taken BEFORE redaction (on the raw text, each pattern
    * independently); replacement is sequential in [[piiPatterns]]
    * order. Everything is a narrow codegen'd transform — the scrub
    * streams through a corpus scan at IO speed with zero shuffles.
    */
  private[graft] def withPiiCols(df: DataFrame): DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (acc, (name, pat, _)) =>
      acc.withColumn(s"n_$name",
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long"))
    }
    val redacted = piiPatterns.foldLeft(col("text")) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
    counted.withColumn("clean_text", redacted)
  }

  /** PII redaction over the documents table: doc_id, match counts per
    * pattern, redacted text. See [[withPiiCols]].
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    withPiiCols(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_number"),
        col("clean_text"))
      .orderBy(col("doc_id"))

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Table A1 — the rule family most
    * curation stacks since have reused): word-count bounds, mean word
    * length bounds, minimum alphabetic-word fraction, minimum stopword
    * hits. Emitted as one boolean per rule plus the conjunction, so a
    * pipeline can both GATE (pass_gopher) and DIAGNOSE (which rule
    * fired) in one pass. All ratios are exact integer divisions
    * (SURVEY §4); every column is a narrow per-row transform.
    *
    * Thresholds are tuned to this corpus's scale (synthetic docs are
    * shorter than web pages) but keep Gopher's structure: 10 ≤ words ≤
    * 100000, 3 ≤ mean word length ≤ 10, ≥ 80% of words contain an
    * alphabetic character, ≥ 2 stopword occurrences.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_words"),
        aggregate(toks, lit(0), (a, t) => a + length(t)).cast("long").as("sum_word_len"),
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("n_alpha_words"),
        size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("long").as("n_stop"))
      .withColumn("mean_word_len", col("sum_word_len") / col("n_words"))
      .withColumn("frac_alpha", col("n_alpha_words") / col("n_words"))
      .withColumn("rule_words", col("n_words") >= 10 && col("n_words") <= 100000)
      .withColumn("rule_word_len", col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("rule_alpha", col("frac_alpha") >= 0.8)
      .withColumn("rule_stop", col("n_stop") >= 2)
      .withColumn("pass_gopher",
        col("rule_words") && col("rule_word_len") && col("rule_alpha") && col("rule_stop"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"), col("frac_alpha"),
        col("n_stop"), col("rule_words"), col("rule_word_len"), col("rule_alpha"),
        col("rule_stop"), col("pass_gopher"))
      .orderBy(col("doc_id"))
  }

  /** Quality-gate ablation — the "which rule is doing the work"
    * report a curation owner reads before tightening or dropping a
    * gate: per [[gopherRules]] rule, how many documents fail it, how
    * many fail ONLY it (its unique kill set — the docs you'd get
    * back by removing just that rule), and the corpus pass count if
    * it were removed. Rules whose kills are all shared with other
    * rules are redundant; rules with a large unique kill set deserve
    * individual review before they delete data at 100 TB. One narrow
    * rule scan (the [[gopherRules]] shape) folded into a single
    * 9-counter aggregate row, exploded to |rules| output rows — no
    * shuffle beyond the one map-side-combined aggregate.
    */
  def gateAblation(spark: SparkSession, dir: String): DataFrame = {
    val g = gopherRules(spark, dir)
    val rules = Seq("rule_words", "rule_word_len", "rule_alpha", "rule_stop")
    def others(r: String) =
      rules.filter(_ != r).map(col).reduce(_ && _)
    val aggCols: Seq[Column] =
      count(when(col("pass_gopher"), 1)).as("n_pass_all") +:
        rules.flatMap { r =>
          Seq(count(when(!col(r), 1)).as(s"f_$r"),
            count(when(!col(r) && others(r), 1)).as(s"u_$r"))
        }
    val counters = g.agg(count(lit(1)).as("n_docs"), aggCols: _*)
    val rows = rules.map { r =>
      s"struct('${r.stripPrefix("rule_")}' AS rule, f_$r AS n_fail, u_$r AS n_unique_fail)"
    }.mkString("array(", ", ", ")")
    counters
      .select(col("n_docs"), col("n_pass_all"), explode(expr(rows)).as("x"))
      .select(col("x.rule").as("rule"), col("x.n_fail").as("n_fail"),
        col("x.n_unique_fail").as("n_unique_fail"),
        col("n_docs"), col("n_pass_all"),
        (col("n_pass_all") + col("x.n_unique_fail")).as("n_pass_without"),
        round(col("x.n_fail") / col("n_docs"), 5).as("fail_rate"))
      .orderBy(col("rule"))
  }

  /** Intra-document repetition signals (the Gopher/Dolma repetition
    * family): duplicate-bigram fraction and the most frequent bigram's
    * share of the document. High values flag boilerplate and generated
    * spam that inter-document dedup can't see. The distinct/total
    * counts are array-side narrow transforms; the top-bigram count
    * explodes and aggregates KEYED BY (doc_id, bigram) — blocked per
    * document, so no key ever exceeds one document's bigrams and the
    * aggregate partial-combines map-side.
    */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), bigrams.as("bgs"))
      .select(col("doc_id"),
        size(col("bgs")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bgs"))).cast("long").as("n_distinct"),
        col("bgs"))
    val top = base.where(col("n_bigrams") > 0)
      .select(col("doc_id"), explode(col("bgs")).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"))
    base.drop("bgs")
      .join(top, Seq("doc_id"), "left")
      .withColumn("top_bigram_n", coalesce(col("top_bigram_n"), lit(0L)))
      // exact integer ratios (SURVEY §4); 0-bigram docs are 0-dup
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") > 0, (col("n_bigrams") - col("n_distinct")) / col("n_bigrams"))
          .otherwise(lit(0.0)))
      .withColumn("top_bigram_share",
        when(col("n_bigrams") > 0, col("top_bigram_n") / col("n_bigrams"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"), col("top_bigram_n"),
        col("dup_bigram_frac"), col("top_bigram_share"))
      .orderBy(col("doc_id"))
  }

  /** Document chunking — the RAG/embedding-prep splitter: fixed-size
    * character windows with overlap, so every document becomes
    * embeddable units under a model's context limit while no boundary
    * sentence is lost to a hard cut. Chunk starts step by
    * `size − overlap`; the last chunk is short rather than padded.
    * A narrow explode (no shuffle) — at 100 TB this streams through
    * the scan and multiplies rows by ~len/step, which is the point:
    * chunking must never be a per-document driver loop.
    */
  def chunk(spark: SparkSession, dir: String, size: Int = 200, overlap: Int = 50): DataFrame = {
    require(overlap < size, s"overlap $overlap must be < size $size")
    val step = size - overlap
    // last start = ceil((len − size)/step) (floored at 0): the final
    // chunk must extend PAST the previous chunk's end — a start inside
    // the previous chunk's tail would emit a wholly-contained
    // duplicate (e.g. len=200: one chunk, not a 200-char chunk plus
    // its own last 50 chars again)
    chunkFrame(spark, dir, size, step)
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** The unordered chunk stream [[chunk]], [[dedupChunks]] and
    * [[TextRetrieval.chunkPassageTopK]] share — a narrow explode, no
    * shuffle. */
  private[operators] def chunkFrame(spark: SparkSession, dir: String,
                         size: Int, step: Int): DataFrame =
    Tables.documents(spark, dir)
      .where(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, greatest((length(text) - $size + $step - 1) div $step, 0)), " +
          s"i -> substring(text, i * $step + 1, $size))")))
      .toDF("doc_id", "chunk_id", "chunk_text")
      .withColumn("chunk_id", col("chunk_id").cast("long"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))

  /** Cross-document chunk-level exact dedup — the paragraph-dedup
    * analog for a corpus without natural paragraph boundaries: chunk
    * every document with the SAME deterministic fixed-window splitter
    * as [[chunk]], hash each chunk, and mark every copy after the
    * first (keep-first by (doc_id, chunk_id)) as a duplicate. Reports
    * the per-document duplicated-chunk fraction — the signal a
    * curation pipeline thresholds on to drop boilerplate-heavy
    * documents that exact whole-doc dedup misses.
    *
    * Scale: the chunk stream is a narrow explode; the dup verdict is
    * one window keyed by the 128-bit chunk hash (partition count =
    * distinct hashes, no hot key beyond true duplicate mass); the
    * rollup partial-aggregates map-side by doc_id. Never compares
    * chunk text pairwise.
    */
  def dedupChunks(spark: SparkSession, dir: String,
                  size: Int = 200, overlap: Int = 50): DataFrame = {
    require(overlap < size, s"overlap $overlap must be < size $size")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hash")).orderBy(col("doc_id"), col("chunk_id"))
    chunkFrame(spark, dir, size, size - overlap)
      .withColumn("hash", md5(col("chunk_text")))
      .withColumn("is_dup", row_number().over(w) > 1)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("is_dup"), 1)).as("n_dup_chunks"),
        round(count(when(col("is_dup"), 1)) / count(lit(1)), 4).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Unigram log-probability score — the cheap perplexity proxy
    * (CCNet/Dolma-style: a language-model filter approximated by the
    * corpus's own unigram distribution). Per document: the mean
    * negative log-likelihood of its tokens under the corpus unigram
    * model, avg_nll = −Σ tf·ln(ct/T) / Σ tf, where ct is the term's
    * corpus count and T the total token count. Low avg_nll = the
    * document is made of corpus-typical tokens; high = rare-token
    * soup — the threshold signal quality pipelines use when a real LM
    * is too expensive to run over 100 TB.
    *
    * Reuses the persisted TF-IDF model's sparse tf triples
    * ([[TextRetrieval.ensureModel]] — fit once per corpus
    * fingerprint), so scoring is one vocab-keyed aggregate, a join of
    * the triples against the vocab-sized count table (AQE broadcasts
    * it), and a doc-keyed partial aggregate. No re-tokenization, no
    * dense vectors.
    */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame = {
    val m = TextRetrieval.ensureModel(spark, dir)
    val ct = m.tf.groupBy(col("term")).agg(sum(col("tf")).as("ct"))
    val tot = ct.agg(sum(col("ct")).as("tot"))
    m.tf.join(ct, "term")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        round(-sum(col("tf") * log(col("ct") / col("tot"))) / sum(col("tf")), 5)
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): each
    * document lands in its SOURCE's head / middle / tail tercile by
    * LM score — here [[unigramLogProb]]'s per-doc avg NLL, the same
    * cheap-LM ladder rung CCNet's KenLM plays. Per-source cutoffs
    * (docs within a source share a register; cross-source NLLs are
    * not comparable) are exact interpolated terciles over the ROUNDED
    * per-doc NLLs, themselves rounded to 5 — bucket membership then
    * compares 5-decimal values on both engines, so the boundary is
    * reproducible. Head = lowest NLL (most corpus-typical), the slice
    * CCNet keeps at full weight.
    *
    * Scale shape: rides [[unigramLogProb]]'s shape (vocab-sized count
    * table broadcast over one tf frame); the cutoff table is
    * |sources|×2 and broadcasts back over one scored scan — the
    * [[quality]] percentile-gate pattern, no global sort.
    */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val nll = unigramLogProb(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
    val cuts = nll.groupBy(col("source")).agg(
      round(expr("percentile(avg_nll, 1.0D / 3)"), 5).as("q1"),
      round(expr("percentile(avg_nll, 2.0D / 3)"), 5).as("q2"))
    nll.join(broadcast(cuts), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("avg_nll"),
        when(col("avg_nll") <= col("q1"), lit("head"))
          .when(col("avg_nll") <= col("q2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated bigram log-probability — the next step up from
    * [[unigramLogProb]] on the cheap-LM-filter ladder: per document,
    * the mean negative log-likelihood of its token BIGRAMS under the
    * corpus's own interpolated bigram model,
    * p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/T (Jelinek–Mercer
    * smoothing with λ an exact binary fraction so both engines build
    * the identical float expression). Catches word-salad documents
    * whose unigrams are corpus-typical but whose transitions are not —
    * the signal the unigram proxy is blind to.
    *
    * Scale: bigrams come from one narrow pass (transform over the
    * token array — no window, no self-join), collapse to per-doc
    * (doc,w1,w2,tf) triples FIRST (map-side combine), and the corpus
    * bigram count table derives from those same triples — the one
    * genuinely corpus-sized join is keyed by (w1,w2), exactly the
    * shape AQE handles (the unigram count table is vocab-sized and
    * broadcasts). The triples are ScratchCache-materialized: probe
    * and count sides read one tokenize pass, not two.
    */
  def bigramLogProb(spark: SparkSession, dir: String, lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    val m = TextRetrieval.ensureModel(spark, dir)
    val ct = m.tf.groupBy(col("term")).agg(sum(col("tf")).as("ct"))
    val tot = ct.agg(sum(col("ct")).as("tot"))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextRetrieval.sklearnTokens(col("text")).as("l"))
      .where(size(col("l")) >= 2)
    // adjacent pairs from the SAME array via transform-with-index —
    // no posexplode/self-join, no window
    val bg = toks
      .select(col("doc_id"), explode(expr(
        "transform(slice(l, 1, size(l) - 1), (x, i) -> struct(x AS w1, element_at(l, i + 2) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tf12 = graft.sources.ScratchCache.materialize(
      bg.groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("tf12")))
    val c12 = tf12.groupBy(col("w1"), col("w2")).agg(sum(col("tf12")).as("c12"))
    tf12.join(c12, Seq("w1", "w2"))
      .join(ct.select(col("term").as("w1"), col("ct").as("c1")), Seq("w1"))
      .join(ct.select(col("term").as("w2"), col("ct").as("c2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf12")).as("n_bigrams"),
        round(-sum(col("tf12") *
          log(lit(lambda) * col("c12") / col("c1") + lit(1 - lambda) * col("c2") / col("tot"))) /
          sum(col("tf12")), 5).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Held-out LM generalization report — [[bigramLogProb]]'s model
    * actually VALIDATED: the interpolated bigram LM is fit on the
    * deterministic 80% hash split only ([[Curation.hashSample]]'s
    * md5 convention) and scored on BOTH splits, per source. The
    * eval−train NLL gap is the overfit number that decides whether a
    * perplexity filter's thresholds transfer to unseen data — a
    * filter tuned on in-sample NLL silently tightens on fresh crawl.
    *
    * Smoothing: Jelinek–Mercer λ·c12/c1 on train counts, backing off
    * to ADD-1 train unigrams (c2+1)/(T+V) so eval-only words keep a
    * finite floor (pure JM would hand them p=0 → infinite NLL).
    * λ = 0.75, an exact binary fraction; both engines build the
    * identical float expression and round once per cell; the gap is
    * computed from the ROUNDED NLLs. Sources with no train (or no
    * eval) bigrams report NULL on that side, both engines.
    *
    * Scale shape: the [[bigramLogProb]] plan plus one broadcast split
    * flag — per-doc bigram triples collapse map-side, the one
    * corpus-scale join is (w1,w2)-keyed, train unigram counts are
    * vocab-sized broadcasts, and the report is |sources| rows from a
    * single conditional aggregate (no second scoring pass per split).
    */
  def lmHoldoutPpl(spark: SparkSession, dir: String, lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    val m = TextRetrieval.ensureModel(spark, dir)
    val split = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      (substring(md5(col("doc_id").cast("string")), 1, 4) < "cccc").as("is_train"))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextRetrieval.sklearnTokens(col("text")).as("l"))
      .where(size(col("l")) >= 2)
    val bg = toks
      .select(col("doc_id"), explode(expr(
        "transform(slice(l, 1, size(l) - 1), (x, i) -> struct(x AS w1, element_at(l, i + 2) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tf12 = graft.sources.ScratchCache.materialize(
      bg.groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("tf12"))
        .join(split, "doc_id"))
    val c12t = tf12.where(col("is_train"))
      .groupBy(col("w1"), col("w2")).agg(sum(col("tf12")).as("c12"))
    val ctt = graft.sources.ScratchCache.materialize(
      m.tf.join(split.where(col("is_train")).select(col("doc_id")), "doc_id")
        .groupBy(col("term")).agg(sum(col("tf")).as("ct")))
    val tv = ctt.agg(sum(col("ct")).as("tot"), count(lit(1)).as("v"))
    val p = lit(lambda) * coalesce(col("c12") / col("c1"), lit(0.0)) +
      lit(1 - lambda) * (coalesce(col("c2"), lit(0L)) + 1.0) / (col("tot") + col("v"))
    tf12
      .join(c12t, Seq("w1", "w2"), "left_outer")
      .join(ctt.select(col("term").as("w1"), col("ct").as("c1")), Seq("w1"), "left_outer")
      .join(ctt.select(col("term").as("w2"), col("ct").as("c2")), Seq("w2"), "left_outer")
      .crossJoin(broadcast(tv))
      .select(col("source"), col("is_train"), col("tf12"),
        (col("tf12") * log(p)).as("lp"))
      .groupBy(col("source"))
      .agg(
        coalesce(sum(when(col("is_train"), col("tf12"))), lit(0L)).as("train_bigrams"),
        coalesce(sum(when(col("is_train") === false, col("tf12"))), lit(0L)).as("eval_bigrams"),
        round(-sum(when(col("is_train"), col("lp"))) /
          sum(when(col("is_train"), col("tf12"))), 5).as("train_nll"),
        round(-sum(when(col("is_train") === false, col("lp"))) /
          sum(when(col("is_train") === false, col("tf12"))), 5).as("eval_nll"))
      .withColumn("gap", round(col("eval_nll") - col("train_nll"), 5))
      .orderBy(col("source"))
  }

  /** Vocabulary stability across the hash split — do the two halves
    * of the corpus even agree on what the top terms ARE? The top-k
    * term lists by occurrence count on the 80% and 20% md5 splits,
    * compared by overlap, Jaccard, and mean rank displacement over
    * the shared terms. A lexical model (TF-IDF, BM25, the NB filter)
    * fit on one split transfers only as far as this table says the
    * head vocabulary is stable; heavy displacement at the head is the
    * cheap early warning [[lmHoldoutPpl]]'s NLL gap confirms.
    *
    * Each leg is a deterministic (count DESC, term ASC) top-k over
    * exact integer counts; the k-row lists are bounded driver
    * artifacts and the metrics exact set ops plus one rounded mean
    * ([[TextRetrieval.rankerAgreement]]'s convention). One term-keyed
    * conditional aggregate is the corpus-scale work. Output is 1 row.
    */
  def vocabStability(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    import spark.implicits._
    val m = TextRetrieval.ensureModel(spark, dir)
    val split = Tables.documents(spark, dir).select(col("doc_id"),
      (substring(md5(col("doc_id").cast("string")), 1, 4) < "cccc").as("is_train"))
    val counts = m.tf.join(split, "doc_id")
      .groupBy(col("term"))
      .agg(sum(when(col("is_train"), col("tf"))).as("ct"),
        sum(when(col("is_train") === false, col("tf"))).as("ce"))
    def top(c: String): Seq[String] = counts.where(col(c).isNotNull)
      .orderBy(col(c).desc, col("term")).limit(k)
      .select(col("term")).collect().map(_.getString(0)).toSeq
    val (a, b) = (top("ct"), top("ce"))
    val ra = a.zipWithIndex.toMap
    val rb = b.zipWithIndex.toMap
    val inter = a.toSet & b.toSet
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((k.toLong, inter.size.toLong,
      r5(inter.size.toDouble / (a.size + b.size - inter.size)),
      if (inter.isEmpty) 0.0
      else r5(inter.toSeq.map(t => math.abs(ra(t) - rb(t))).sum.toDouble / inter.size)))
      .toDF("k", "n_shared", "jaccard", "mean_rank_shift")
  }

  /** Alphabet for [[charEntropy]]: lowercase ASCII letters + digits.
    * Shared with the oracle builder so both engines count the exact
    * same symbol set.
    */
  private[graft] val entropyAlphabet: Seq[Char] = ('a' to 'z') ++ ('0' to '9')

  /** Per-symbol count via the length/replace identity — pure string
    * expressions that parse identically in Spark SQL and DuckDB, so
    * the Spark plan and the oracle build the SAME expression tree
    * (association order and all) and float drift cannot flip a value.
    */
  private[graft] def entropyCountCols: Seq[String] =
    entropyAlphabet.map(c =>
      s"(length(t) - length(replace(t, '$c', ''))) AS c_$c")

  /** The outer select over the named count columns: total alphanumeric
    * count and Shannon entropy (nats) via H = ln(n) − Σ c·ln(c) / n.
    */
  private[graft] def entropyOuterCols: Seq[String] = {
    val names = entropyAlphabet.map(c => s"c_$c")
    val n = names.mkString("CAST(", " + ", " AS BIGINT)")
    val terms = names.map(c =>
      s"CASE WHEN $c > 0 THEN $c * ln($c) ELSE CAST(0 AS DOUBLE) END").mkString(" + ")
    Seq(
      "doc_id",
      s"$n AS n_alnum",
      s"round(CASE WHEN $n > 0 THEN ln(CAST($n AS DOUBLE)) - ($terms) / $n ELSE CAST(0 AS DOUBLE) END, 5) AS entropy_nats")
  }

  /** Character-level Shannon entropy over the [a-z0-9] alphabet — the
    * classic cheap gibberish/boilerplate detector (near-zero entropy =
    * one repeated symbol, ~5.1 nats = uniform soup; real text sits in
    * a narrow band, so both tails are quality-filter candidates).
    *
    * Scale: NO explode — a per-character explode would shuffle one row
    * per character (100 T rows at the target scale). Instead each of
    * the 36 symbol counts is a `length(t) − length(replace(t, c, ''))`
    * expression: a fully narrow scan, zero shuffles, that streams at
    * IO speed. Two chained projections keep each count computed once
    * (CollapseProject leaves non-cheap multiply-referenced aliases in
    * place); the entropy itself is arithmetic over the 36 counts.
    * Both projections are built from the same SQL fragments the
    * DuckDB oracle uses, so cross-engine parity is by construction.
    */
  /** Per-document lexical diversity — the vocabulary-richness quality
    * gate ([[charEntropy]] catches character-level gibberish, this
    * catches WORD-level degeneracy: keyword stuffing, tag clouds,
    * log spam — docs whose tokens barely repeat or repeat far too
    * much): type count, token count, hapax count, type-token ratio,
    * Guiraud's root TTR (types/√tokens — the length-robust form; raw
    * TTR falls with length for healthy text), and the hapax share.
    * Served from the persisted tf triples — types = rows per doc,
    * tokens = Σtf, hapax = rows with tf = 1 — so the gate costs one
    * map-side-combined aggregate over an artifact that already
    * exists; docs with no ≥2-char token carry no triples and are
    * absent, the model family's documented convention.
    */
  def docLexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    val m = TextRetrieval.ensureModel(spark, dir)
    m.tf.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_types"), sum(col("tf")).as("n_tokens"),
        count(when(col("tf") === 1, 1)).as("n_hapax"))
      .select(col("doc_id"), col("n_types"), col("n_tokens"), col("n_hapax"),
        round(col("n_types") / col("n_tokens"), 5).as("ttr"),
        round(col("n_types") / sqrt(col("n_tokens")), 5).as("root_ttr"),
        round(col("n_hapax") / col("n_types"), 5).as("hapax_ratio"))
      .orderBy(col("doc_id"))
  }

  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .selectExpr("doc_id" +: entropyCountCols: _*)
      .selectExpr(entropyOuterCols: _*)
      .orderBy(col("doc_id"))

  /** Rank-normalized quality composite — the cross-signal blend a
    * curation run actually gates on: each signal (length, type-token
    * ratio, stopword ratio) quartile-bins against its OWN corpus
    * distribution — exact `percentile` cutoffs computed once and
    * BROADCAST back over one scored scan (the [[Analytics.userRfm]]
    * shape; no ntile global sort ever plans) — and the composite is
    * the 3–12 bin sum, so a signal's absolute scale can't dominate
    * the blend the way it does in [[withQualityCols]]'s fixed-weight
    * score. Cutoffs rounded to 5 decimals on BOTH engines before
    * comparison so interpolation ulps can't flip a bin.
    */
  def qualityComposite(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.sources.ScratchCache.materialize(
      withQualityCols(Tables.documents(spark, dir))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len_chars"),
          (col("n_types") / col("n_tok")).as("ttr"),
          (col("n_stop") / col("n_tok")).as("stop_ratio")))
    val cuts = scored.select(
      expr("percentile(len_chars, array(0.25D, 0.5D, 0.75D))").as("lq"),
      expr("percentile(ttr, array(0.25D, 0.5D, 0.75D))").as("tq"),
      expr("percentile(stop_ratio, array(0.25D, 0.5D, 0.75D))").as("sq"))
    def bin(m: Column, q: Column): Column =
      lit(1) + when(m > round(element_at(q, 1), 5), 1).otherwise(0) +
        when(m > round(element_at(q, 2), 5), 1).otherwise(0) +
        when(m > round(element_at(q, 3), 5), 1).otherwise(0)
    scored.crossJoin(broadcast(cuts))
      .withColumn("q_len", bin(col("len_chars"), col("lq")).cast("long"))
      .withColumn("q_ttr", bin(col("ttr"), col("tq")).cast("long"))
      .withColumn("q_stop", bin(col("stop_ratio"), col("sq")).cast("long"))
      .withColumn("composite", col("q_len") + col("q_ttr") + col("q_stop"))
      .select(col("doc_id"), col("len_chars"), col("ttr"), col("stop_ratio"),
        col("q_len"), col("q_ttr"), col("q_stop"), col("composite"))
      .orderBy(col("doc_id"))
  }

  /** Per-source quality rollup — the mixture-table input: how each
    * source's documents distribute over [[qualityComposite]]'s
    * rank-normalized blend (mean composite, high/low-tail fractions,
    * mean length). One aggregate over the SAME composite frame the
    * per-document query serves (the [[graft.operators.Dedup.dedupReport]]
    * reuse rule); fractions are exact integer ratios, |sources| rows
    * out.
    */
  def sourceQualityReport(spark: SparkSession, dir: String): DataFrame =
    qualityComposite(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("composite")).as("sum_composite"),
        sum(when(col("composite") >= 9, 1L).otherwise(0L)).as("n_high"),
        sum(when(col("composite") <= 5, 1L).otherwise(0L)).as("n_low"),
        sum(col("len_chars")).as("sum_chars"))
      .select(col("source"), col("n_docs"),
        (col("sum_composite") / col("n_docs")).as("mean_composite"),
        (col("n_high") / col("n_docs")).as("high_frac"),
        (col("n_low") / col("n_docs")).as("low_frac"),
        (col("sum_chars") / col("n_docs")).as("mean_chars"))
      .orderBy(col("source"))

  /** Readability scoring — Flesch reading ease + Flesch-Kincaid grade
    * with fully deterministic proxies: words are `[a-z0-9_]+` runs of
    * the lowercased text (the corpus tokenizer's alphabet), sentences
    * are `[.!?]+` runs floored at 1, syllables are `[aeiouy]+` vowel
    * groups — each one regexp count evaluated by BOTH engines over
    * the same pattern, so the score replays exactly (the classic
    * syllable heuristic, off-by-a-bit on English edge cases but
    * identical everywhere, which is what a corpus-scale quality
    * signal needs). Zero-shuffle narrow scan; ratios are exact
    * integer-over-integer doubles rounded once.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("regexp_count(lower(text), '[a-z0-9_]+')").cast("long").as("n_words"),
        greatest(expr("regexp_count(text, '[.!?]+')"), lit(1)).cast("long").as("n_sentences"),
        expr("regexp_count(lower(text), '[aeiouy]+')").cast("long").as("n_syllables"))
      .where(col("n_words") > 0)
      .withColumn("flesch",
        round(lit(206.835) - lit(1.015) * (col("n_words") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables") / col("n_words")), 4))
      .withColumn("fk_grade",
        round(lit(0.39) * (col("n_words") / col("n_sentences"))
          + lit(11.8) * (col("n_syllables") / col("n_words")) - lit(15.59), 4))
      .orderBy(col("doc_id"))

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

  /** Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β estimated from 16
    * deterministic md5-sharded corpus prefixes — the companion
    * distributional gate to [[vocabZipf]] (a generated or template
    * corpus bends β away from the 0.4–0.6 natural-text band, and the
    * fit predicts vocabulary size at the next corpus scale-up).
    * ONE explode pass: per term the MIN shard it appears in, per
    * shard its token count; prefix points then come from two
    * 16-row cumulative folds, and the ln-ln least squares is closed
    * form over those 16 points. Everything before the fit is exact
    * integers.
    *
    * Determinism (the r11 red row): the slope is the RECENTERED form
    * Σ(x−x̄)(y−ȳ)/Σ(x−x̄)² — on a degenerate corpus whose whole
    * vocabulary lands in the first shard, y is constant and the old
    * n·Σxy−ΣxΣy numerator was a pure catastrophic-cancellation
    * residual (~±1e-14) whose SIGN was an engine coin flip, and
    * round(−1e-14, 5) = −0.0 hashes differently from +0.0. Recentering
    * makes the numerator ~ε·Σ(x−x̄) ≈ 1e-30 regardless of engine, and
    * the final `+ 0.0` collapses −0.0 to +0.0 (IEEE: −0.0 + 0.0 =
    * +0.0) on both engines. A single-point series (whole corpus in one
    * shard) has zero x-variance → NULL slope on both engines
    * (explicit guard; DuckDB would otherwise emit NaN).
    */
  def vocabHeaps(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"),
        explode(TextRetrieval.sklearnTokens(col("text"))).as("term"))
    val t = graft.sources.ScratchCache.materialize(
      toks.groupBy(col("shard"), col("term")).agg(count(lit(1)).as("tf")))
    val perShardTokens = t.groupBy(col("shard")).agg(sum(col("tf")).as("toks"))
    val firstShard = t.groupBy(col("term")).agg(min(col("shard")).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("new_terms"))
    val w = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perShardTokens.join(firstShard, Seq("shard"), "left_outer")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("n", sum(col("toks")).over(w))
      .withColumn("v", sum(col("new_terms")).over(w))
      .select(log(col("n").cast("double")).as("x"), log(col("v").cast("double")).as("y"),
        col("n"), col("v"))
    val m = pts.agg(avg(col("x")).as("xb"), avg(col("y")).as("yb"))
    pts.crossJoin(broadcast(m))
      .agg(count(lit(1)).as("n_points"),
        max(col("n")).as("total_tokens"), max(col("v")).as("vocab_size"),
        sum((col("x") - col("xb")) * (col("y") - col("yb"))).as("sxy_c"),
        sum((col("x") - col("xb")) * (col("x") - col("xb"))).as("sxx_c"))
      .select(col("n_points"), col("total_tokens"), col("vocab_size"),
        when(col("sxx_c") === 0, lit(null).cast("double"))
          .otherwise(round(col("sxy_c") / col("sxx_c"), 5) + lit(0.0))
          .as("heaps_beta"))
  }

  /** Language × source independence test (Pearson chi-square over the
    * contingency table): the one-number answer to "is language
    * composition uniform across sources, or does some source skew?" —
    * the stratification check before per-language mixture weights are
    * trusted. Observed cells come from ONE aggregate; margins and the
    * grand total derive by RE-aggregating those cells (never a second
    * corpus scan — the two-level summation the oracle replays).
    * Everything is exact integers until the χ² fold over |cells| rows.
    */
  def langSourceChi2(spark: SparkSession, dir: String): DataFrame = {
    val obs = graft.sources.ScratchCache.materialize(
      Tables.documents(spark, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n")))
    val rowT = obs.groupBy(col("lang")).agg(sum(col("n")).as("row_n"))
    val colT = obs.groupBy(col("source")).agg(sum(col("n")).as("col_n"))
    val tot = obs.agg(sum(col("n")).as("total"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    obs.join(broadcast(rowT), "lang")
      .join(broadcast(colT), "source")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("n_langs"), col("n_sources"), col("total"),
        (col("row_n") * col("col_n") / col("total").cast("double")).as("expected"))
      .agg(
        max(col("n_langs")).as("n_langs"),
        max(col("n_sources")).as("n_sources"),
        max(col("total")).as("n_docs"),
        ((max(col("n_langs")) - 1) * (max(col("n_sources")) - 1)).as("dof"),
        round(sum(pow(col("n") - col("expected"), 2) / col("expected")), 4).as("chi2"))
  }

  /** Top discriminative terms per source by smoothed log-odds ratio
    * (the "fightin' words" report, Monroe et al. 2008 simplified to
    * add-0.5 smoothing): which vocabulary does each source
    * over-represent against the rest of the corpus — the content-mix
    * explainer next to [[sourceKl]]'s one-number divergence. Term
    * counts ride the persisted TF-IDF triples joined to the source
    * map (one doc-keyed shuffle); corpus totals derive by re-agg;
    * ranking is WindowGroupLimit-bounded per source.
    */
  def sourceLogOdds(spark: SparkSession, dir: String, topN: Int = 5,
                    docFilter: Column = lit(true)): DataFrame = {
    val m = TextRetrieval.ensureModel(spark, dir)
    val st = graft.sources.ScratchCache.materialize(
      m.tf.join(Tables.documents(spark, dir).where(docFilter)
            .select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy(col("source"), col("term")).agg(sum(col("tf")).as("y")))
    val srcTot = st.groupBy(col("source")).agg(sum(col("y")).as("ns"))
    val termTot = st.groupBy(col("term")).agg(sum(col("y")).as("yw"))
    val tot = st.agg(sum(col("y")).as("nn"))
    val scored = st.join(broadcast(srcTot), "source")
      .join(termTot, "term")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("term"), col("y"),
        round(
          log((col("y") + 0.5) / (col("ns") - col("y") + 0.5)) -
          log((col("yw") - col("y") + 0.5) /
              (col("nn") - col("ns") - (col("yw") - col("y")) + 0.5)), 5)
          .as("log_odds"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("log_odds").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= topN)
      .select(col("source"), col("rk"), col("term"), col("y"), col("log_odds"))
      .orderBy(col("source"), col("rk"))
  }

  /** Percolation / reverse search — stored queries matched against an
    * incoming document stream (the Elasticsearch-percolator /
    * alerting shape: subscriptions are registered once, every NEW doc
    * is tested against all of them). Subscriptions here are each
    * source's top-`termsPerQuery` discriminative terms from
    * [[sourceLogOdds]] (the per-source alert profile an analyst would
    * register) — fit ONLY on the md5-split training 80%, so the
    * held-out 20% "incoming stream" really is docs the profiles were
    * NOT tuned to and the routing-precision readout is an honest
    * holdout number (r12 fit on the full corpus, which optimistically
    * biased it). A doc fires a subscription
    * when it contains ≥ `minMatch` of its terms. Per subscription:
    * docs matched, match rate over the incoming batch, and the
    * own-source share of its matches — the routing-precision number
    * (a healthy alert profile mostly fires on its own source's docs).
    *
    * Scale shape: subscriptions are a bounded (sources ×
    * termsPerQuery) broadcast; matching is one term-keyed join
    * against the persisted tf triples semi-joined to the incoming
    * batch — per-doc work ∝ matching terms, never |subscriptions|;
    * counts exact, two rounded ratios.
    */
  /** The repo-wide deterministic 80/20 doc split (md5 4-hex prefix,
    * 'cccc'/'ffff' = 0.8): `trainSplit` is the fit side, its complement
    * the holdout every eval scores on.
    */
  private[graft] def trainSplit: Column =
    substring(md5(col("doc_id").cast("string")), 1, 4) < "cccc"

  def percolate(spark: SparkSession, dir: String, termsPerQuery: Int = 3,
                minMatch: Int = 2): DataFrame = {
    val subs = graft.sources.ScratchCache.materialize(
      sourceLogOdds(spark, dir, topN = termsPerQuery, docFilter = trainSplit)
        .select(col("source").as("sub_source"), col("term")))
    val incoming = graft.sources.ScratchCache.materialize(
      Tables.documents(spark, dir)
        .where(!trainSplit)
        .select(col("doc_id"), col("source")))
    val m = TextRetrieval.ensureModel(spark, dir)
    val fired = m.tf.select(col("doc_id"), col("term"))
      .join(incoming.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(broadcast(subs), Seq("term"))
      .groupBy(col("doc_id"), col("sub_source"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minMatch)
    val nin = incoming.agg(count(lit(1)).as("n_incoming"))
    val per = fired.join(incoming, Seq("doc_id"))
      .groupBy(col("sub_source"))
      .agg(count(lit(1)).as("n_matched"),
        count(when(col("source") === col("sub_source"), 1)).as("n_own"))
    subs.select(col("sub_source")).distinct()
      .join(per, Seq("sub_source"), "left_outer")
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
      .withColumn("n_own", coalesce(col("n_own"), lit(0L)))
      .crossJoin(broadcast(nin))
      .select(col("sub_source"), col("n_incoming"), col("n_matched"),
        round(col("n_matched") / col("n_incoming"), 5).as("match_rate"),
        when(col("n_matched") === 0, lit(0.0))
          .otherwise(round(col("n_own") / col("n_matched"), 5)).as("own_share"))
      .orderBy(col("sub_source"))
  }

  /** The per-doc percolation core over an ARBITRARY (doc_id, text)
    * frame — the piece [[percolate]] and the streaming gate
    * ([[graft.streaming.PercolateStreams]]) share: tokenize with the
    * corpus tokenizer contract, fire each subscription at ≥ `minMatch`
    * distinct term hits. Subscriptions ride as a bounded broadcast, so
    * per-doc work ∝ matching terms. Returns (doc_id, sub_source,
    * hits).
    */
  def percolateDocs(spark: SparkSession, dir: String, docs: DataFrame,
                    termsPerQuery: Int = 3, minMatch: Int = 2): DataFrame = {
    // same train-split-fit profiles as [[percolate]] — the stream gate
    // and the batch readout must register identical subscriptions
    val subs = graft.sources.ScratchCache.materialize(
      sourceLogOdds(spark, dir, topN = termsPerQuery, docFilter = trainSplit)
        .select(col("source").as("sub_source"), col("term")))
    docs.select(col("doc_id"),
      explode(array_distinct(TextRetrieval.sklearnTokens(col("text")))).as("term"))
      .join(broadcast(subs), Seq("term"))
      .groupBy(col("doc_id"), col("sub_source"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minMatch)
  }

  /** Bigram collocations ranked by pointwise mutual information — the
    * classic "strongly associated word pair" extractor (Church & Hanks
    * 1990): PMI = ln(P(w1w2) / (P(w1)P(w2))) with bigram probability
    * over the corpus's T adjacent pairs and unigram probabilities over
    * its U tokens, computed as ln(c12·U/T · U/(c1·c2)) so no integer
    * product can overflow at any corpus size (the BIGINT c12·U² would
    * at ~sf1) — raw frequency ([[graft.operators.Curation.bigramFreq]])
    * surfaces "of the"; PMI surfaces names and technical terms. The
    * `minCount` support floor drops the unstable hapax pairs PMI is
    * notorious for. One token explode feeds the unigram counts, one
    * adjacency explode the bigrams; both joins carry one row per
    * distinct word (AQE-broadcast); the final cut is TakeOrdered on
    * (rounded pmi, bigram).
    */
  def collocationPmi(spark: SparkSession, dir: String, topN: Int = 50,
                     minCount: Long = 5L): DataFrame = {
    val toks = split(col("text"), " ")
    val docs = Tables.documents(spark, dir).select(toks.as("toks"))
    val words = docs.select(explode(col("toks")).as("w"))
    val uni = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totU = words.agg(count(lit(1)).as("u"))
    val pairs = docs.select(explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(2)))))
        .otherwise(array().cast("array<string>"))).as("bigram"))
    val totT = pairs.agg(count(lit(1)).as("t"))
    pairs.groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totU)).crossJoin(broadcast(totT))
      .select(col("bigram"), col("c12"), col("c1"), col("c2"),
        round(log(col("c12").cast("double") * col("u") / col("t") *
          col("u") / col("c1") / col("c2")), 5).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topN)
  }

  /** Vocabulary coverage curve: what fraction of all token
    * OCCURRENCES the top-K corpus terms cover, at the standard
    * doubling cuts — the "how big must the vocab be" sizing curve a
    * tokenizer budget reads before [[vocabOovRate]] audits the chosen
    * size per slice. One token count, ONE TakeOrdered cut at the
    * largest K (bounded — the ranking window then runs over those
    * maxK rows only, never the vocabulary), conditional sums per cut;
    * coverage is an exact integer ratio.
    */
  def vocabCoverageCurve(spark: SparkSession, dir: String,
                         cuts: Seq[Int] = Seq(1000, 2000, 4000, 8000)): DataFrame = {
    val maxK = cuts.max
    val tok = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
    val total = tok.agg(count(lit(1)).as("total_tokens"))
    val top = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("w"))))
    top.select(explode(typedlit(cuts.map(_.toLong))).as("vocab_size"),
        col("rk"), col("c"))
      .where(col("rk") <= col("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(sum(col("c")).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("vocab_size"), col("covered_tokens"), col("total_tokens"),
        round(col("covered_tokens") / col("total_tokens"), 5).as("coverage"))
      .orderBy(col("vocab_size"))
  }

  /** T5-style span-corruption pair prep (Raffel et al. 2020 §3.1.4,
    * made DETERMINISTIC: instead of random 15% spans, every
    * `period`-th group of `spanLen` tokens is masked — the same
    * groups on every engine and every run, so the pairs are
    * reproducible and the DuckDB oracle replays them; swap the group
    * predicate for a salted hash when production wants randomness).
    * `input_text` replaces each masked span with the sentinel,
    * `target_text` is the sentinel-prefixed concatenation of the
    * dropped spans — the (inputs, targets) shape a denoising trainer
    * consumes, next to [[graft.operators.Curation.packSequences]] in
    * the prep pipeline. Pure per-row array arithmetic (group
    * slicing via transform/flatten) — zero shuffle, one narrow scan.
    */
  def spanCorruptionPrep(spark: SparkSession, dir: String, spanLen: Int = 3,
                         period: Int = 6, sentinel: String = "<extra_id>"): DataFrame = {
    val toks = split(col("text"), " ")
    val nGroups = ceil(size(toks) / lit(spanLen.toDouble)).cast("int")
    val masked = (g: Column) => g % period === 0
    val inputArr = flatten(transform(sequence(lit(0), nGroups - 1),
      g => when(masked(g), array(lit(sentinel)))
        .otherwise(slice(toks, g * spanLen + 1, lit(spanLen)))))
    val targetArr = flatten(transform(
      filter(sequence(lit(0), nGroups - 1), g => masked(g)),
      g => concat(array(lit(sentinel)), slice(toks, g * spanLen + 1, lit(spanLen)))))
    Tables.documents(spark, dir)
      .where(size(toks) >= spanLen)
      .select(col("doc_id"),
        concat_ws(" ", inputArr).as("input_text"),
        concat_ws(" ", targetArr).as("target_text"),
        (size(targetArr) - size(filter(targetArr, t => t === sentinel)))
          .cast("long").as("n_masked_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Out-of-vocabulary pressure per (lang, source): the share of token
    * occurrences falling outside the corpus's top-`vocabSize`
    * vocabulary — the number that predicts how a fixed-vocab tokenizer
    * will shatter each slice (high OOV ⇒ long byte-fallback token
    * sequences ⇒ the fertility blowup [[tokenFertility]] measures
    * after the fact). The vocabulary is the top terms by corpus
    * frequency (ties lexicographic — deterministic), cut with
    * TakeOrdered and broadcast back (vocabSize rows); the rate is an
    * exact integer ratio. Two token-explode scans (count + probe) —
    * the explode is never cached because at corpus scale it must not
    * be.
    */
  def vocabOovRate(spark: SparkSession, dir: String,
                   vocabSize: Int = 2000): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(vocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("w"), "left_outer")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 5))
      .orderBy(col("lang"), col("source"))
  }

  /** Tokenizer-fertility budgeting per (lang, source) — the
    * multilingual sampling table (how many subword tokens a corpus
    * slice costs per word/char decides its mixture weight and its
    * context-window footprint): docs, exact word/char/byte/estimated-
    * subtoken sums ([[tokenCount]]'s conventions: whitespace words,
    * ceil(len/4) subtokens), and the three derived rates — subtokens
    * per word (fertility), chars per word, bytes per char (>1 flags
    * non-ASCII scripts, where byte-level BPE fertility explodes). One
    * narrow codegen scan + map-side agg to |langs|×|sources| rows;
    * integer sums exact, divisions rounded once.
    */
  def tokenFertility(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        size(toks).cast("long").as("w"),
        length(col("text")).cast("long").as("c"),
        octet_length(col("text")).cast("long").as("b"),
        ceil(length(col("text")) / lit(4.0)).cast("long").as("st"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"), sum(col("c")).as("n_chars"),
        sum(col("b")).as("n_bytes"), sum(col("st")).as("est_subtokens"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_words"),
        col("n_chars"), col("n_bytes"), col("est_subtokens"),
        round(col("est_subtokens") / col("n_words"), 5).as("fertility"),
        round(col("n_chars") / col("n_words"), 5).as("chars_per_word"),
        round(col("n_bytes") / col("n_chars"), 5).as("bytes_per_char"))
      .orderBy(col("lang"), col("source"))
  }

  /** Longer-n repetition coverage — the rest of the Gopher repetition
    * battery ([[docRepetition]] covers n=2; Rae et al. 2021 Table A1
    * runs top-n-gram share for small n and duplicate-n-gram fraction
    * for large n, because the two catch different failure modes: a
    * high TOP share at n=3 is a stuck phrase, a high DUPLICATE
    * fraction at n=5/10 is wholesale block repetition that a single
    * hot trigram never shows). Duplicate fractions are pure per-row
    * array arithmetic (size − size∘distinct — narrow, zero shuffle);
    * only the top-trigram count needs a (doc, gram) aggregate, and
    * that explode is doc-blocked exactly like [[docRepetition]]'s.
    * Ratios are exact-integer divisions (SURVEY §4).
    */
  def ngramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    def grams(n: Int): Column = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    def dupFrac(c: Column): Column =
      when(size(c) > 0,
        (size(c) - size(array_distinct(c))).cast("long") / size(c).cast("long"))
        .otherwise(lit(0.0))
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), grams(3).as("g3"),
        dupFrac(grams(5)).as("dup_5gram_frac"),
        dupFrac(grams(10)).as("dup_10gram_frac"))
      .select(col("doc_id"), size(col("g3")).cast("long").as("n_3grams"),
        col("g3"), col("dup_5gram_frac"), col("dup_10gram_frac"))
    val top = base.where(col("n_3grams") > 0)
      .select(col("doc_id"), explode(col("g3")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_3gram_n"))
    base.drop("g3")
      .join(top, Seq("doc_id"), "left")
      .withColumn("top_3gram_n", coalesce(col("top_3gram_n"), lit(0L)))
      .withColumn("top_3gram_share",
        when(col("n_3grams") > 0, col("top_3gram_n") / col("n_3grams"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_3grams"), col("top_3gram_n"), col("top_3gram_share"),
        col("dup_5gram_frac"), col("dup_10gram_frac"))
      .orderBy(col("doc_id"))
  }
}
