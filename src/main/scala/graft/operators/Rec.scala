package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.ScratchCache

/** Offline recommender evaluation — the measurement loop the reference
  * implies but never ships (app.py recommends by embedding similarity
  * and shows ANN trade-offs in ann_tradeoff_table.csv, yet has no way
  * to ask "do users actually pick what we recommend?"). This is the
  * standard answer: leave-last-out holdout over the behavioral log.
  */
object Rec {

  /** Leave-last-out hit-rate@K for the item-based co-visitation
    * recommender: each eligible user's LAST interacted item (by last
    * interaction time, ties toward the larger item id) is held out,
    * co-occurrence counts are fit on the REMAINING train interactions
    * only (no leakage — the holdout contributes zero edges), every
    * user is scored by summed co-visitation between their train items
    * and each candidate (train items excluded as candidates), and
    * hit@K asks whether the holdout ranks in the top K.
    *
    * Instead of materializing top-K lists, the eval computes the
    * HOLDOUT'S RANK among the user's candidates — 1 + the count of
    * candidates scoring strictly higher (ties toward the smaller item
    * id, the engine's standard order) — and reads hit@K as rank ≤ K
    * for every K in one pass. Users whose holdout receives no score
    * (no train neighbor co-occurred with it) count as misses.
    *
    * Scale shape: baskets are capped at `maxBasket` before the pair
    * join (the [[Analytics.itemCooccurrence]] bound, so no user emits
    * more than maxBasket² pairs); the co matrix, candidate scores and
    * ranks are all item/user-keyed aggregates; output is |ks| rows.
    * Every count is exact BIGINT; the single float op is the final
    * hit-rate division.
    */
  def recHoldoutEval(spark: SparkSession, dir: String,
                     ks: Seq[Int] = Seq(1, 5, 10),
                     maxBasket: Int = 500): DataFrame = {
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"),
        col("ts_ms"))
      .where(col("item_id").isNotNull)
      .groupBy(col("user_id"), col("item_id"))
      .agg(max(col("ts_ms")).as("last_ts"))
    val bk = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(
      bk.where(col("basket") >= 2 && col("basket") <= maxBasket), Seq("user_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("last_ts").desc, col("item_id").desc)
    val ranked = capped.withColumn("rk", row_number().over(w))
    val holdout = ScratchCache.materialize(
      ranked.where(col("rk") === 1).select(col("user_id"), col("item_id").as("h")))
    val train = ScratchCache.materialize(
      ranked.where(col("rk") > 1).select(col("user_id"), col("item_id")))
    val co = train
      .join(train.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
      .where(col("item_id") =!= col("dst"))
      .groupBy(col("item_id").as("src"), col("dst"))
      .agg(count(lit(1)).as("co"))
    val scores = ScratchCache.materialize(train
      .join(co, col("item_id") === col("src"))
      .groupBy(col("user_id"), col("dst"))
      .agg(sum(col("co")).as("score"))
      .join(train.select(col("user_id"), col("item_id").as("dst")),
        Seq("user_id", "dst"), "left_anti"))
    val sh = holdout.join(
      scores.select(col("user_id"), col("dst").as("h"), col("score").as("s_h")),
      Seq("user_id", "h"), "left_outer")
    val ranks = sh.where(col("s_h").isNotNull)
      .join(scores, Seq("user_id"), "left_outer")
      .groupBy(col("user_id"), col("h"))
      .agg((count(when(col("score") > col("s_h") ||
        (col("score") === col("s_h") && col("dst") < col("h")), 1)) + 1).as("rank"))
    val nUsers = holdout.agg(count(lit(1)).as("n_users"))
    ranks
      .select(explode(typedlit(ks.map(_.toLong))).as("k"), col("rank"))
      .groupBy(col("k"))
      .agg(count(when(col("rank") <= col("k"), 1)).as("n_hits"))
      // keep every requested K even when no user hits (or no user
      // was rankable at all): the K axis comes from a literal frame
      .join(spark.createDataFrame(ks.map(k => Tuple1(k.toLong)))
        .toDF("k"), Seq("k"), "right_outer")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .crossJoin(broadcast(nUsers))
      .select(col("k"), col("n_users"), col("n_hits"),
        round(col("n_hits") / col("n_users"), 5).as("hit_rate"))
      .orderBy(col("k"))
  }

  /** Interaction-matrix shape report — the "can collaborative
    * filtering work here" numbers read before anyone trains on the
    * user×item matrix: distinct users/items, non-zeros, density,
    * mean degree on both sides, and the share of interactions held
    * by the top-decile items (cold-start pressure: a matrix whose
    * mass sits in a few head items starves the tail of signal). One
    * distinct (user, item) frame feeds every number; the decile cut
    * is a TakeOrdered over the |items|-row degree frame; exact
    * integer ratios rounded once. Output is one row.
    */
  def uiMatrixStats(spark: SparkSession, dir: String): DataFrame = {
    val ui = ScratchCache.materialize(Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct())
    val deg = ScratchCache.materialize(
      ui.groupBy(col("item_id")).agg(count(lit(1)).as("d")))
    val tot = ui.agg(countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("item_id")).as("n_items"),
      count(lit(1)).as("nnz"))
    val w = Window.orderBy(col("d").desc, col("item_id"))
    val decile = deg.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("ni"))))
      .where(col("rk") <= ceil(col("ni") / 10.0))
      .agg(sum(col("d")).as("decile_nnz"))
    tot.crossJoin(broadcast(decile))
      .select(col("n_users"), col("n_items"), col("nnz"),
        round(col("nnz") / (col("n_users") * col("n_items")), 5).as("density"),
        round(col("nnz") / col("n_users"), 5).as("mean_user_degree"),
        round(col("nnz") / col("n_items"), 5).as("mean_item_degree"),
        round(col("decile_nnz") / col("nnz"), 5).as("top_decile_item_share"))
  }

  /** Leave-last-out hit-rate@K for the CONTENT (embedding-profile)
    * recommender — the evaluation of the reference's actual
    * recommendation path ([[VectorSearch.recommendForUser]]'s
    * mean-of-engaged-items profile, scored by cosine over the item
    * catalog), where [[recHoldoutEval]] evaluates the behavioral
    * co-visitation path; running both on the same holdout split is
    * the content-vs-collaborative bake-off. Same eligible users /
    * last-item holdout / train split; per-user profiles are
    * per-dimension means over the TRAIN items' embeddings with
    * components rounded to 5 decimals ([[VectorSearch.labelCentroids]]'
    * oracle-proven contract, so summation order can't drift the
    * scores); candidates are the engaged-item catalog minus the
    * user's train items, and the holdout's rank is counted directly.
    *
    * Scale shape: profiles are a (user, dim) aggregate collapsed to
    * one array row per user; the catalog is |items| rows BROADCAST;
    * scoring is |users|·|items| bounded fan-out (the catalog is the
    * small dimension by construction), never corpus×corpus.
    */
  def recContentHoldout(spark: SparkSession, dir: String,
                        ks: Seq[Int] = Seq(1, 5, 10),
                        maxBasket: Int = 500): DataFrame = {
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"),
        col("ts_ms"))
      .where(col("item_id").isNotNull)
      .groupBy(col("user_id"), col("item_id"))
      .agg(max(col("ts_ms")).as("last_ts"))
    val bk = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(
      bk.where(col("basket") >= 2 && col("basket") <= maxBasket), Seq("user_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("last_ts").desc, col("item_id").desc)
    val ranked = capped.withColumn("rk", row_number().over(w))
    val holdout = ScratchCache.materialize(
      ranked.where(col("rk") === 1).select(col("user_id"), col("item_id").as("h")))
    val train = ScratchCache.materialize(
      ranked.where(col("rk") > 1).select(col("user_id"), col("item_id")))
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val prof = train
      .join(emb, col("item_id") === col("vec_id"))
      .select(col("user_id"), posexplode(col("embedding")))
      .toDF("user_id", "pos", "v")
      .groupBy(col("user_id"), col("pos"))
      .agg(round(avg(col("v")), 5).as("m"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("user_id"), transform(col("pm"), x => x.getField("m")).as("p"))
    val items = capped.select(col("item_id")).distinct()
      .join(emb, col("item_id") === col("vec_id"))
      .select(col("item_id"), col("embedding"))
    import graft.functions.VectorFunctions._
    val scored = ScratchCache.materialize(prof
      .crossJoin(broadcast(items))
      .select(col("user_id"), col("item_id"),
        round(dotd(col("embedding"), col("p")) /
          (l2norm(col("embedding")) * l2norm(col("p"))), 5).as("score"))
      .join(train, Seq("user_id", "item_id"), "left_anti"))
    val sh = holdout.join(
      scored.select(col("user_id"), col("item_id").as("h"), col("score").as("s_h")),
      Seq("user_id", "h"), "left_outer")
    val ranks = sh.where(col("s_h").isNotNull)
      .join(scored, Seq("user_id"), "left_outer")
      .groupBy(col("user_id"), col("h"))
      .agg((count(when(col("score") > col("s_h") ||
        (col("score") === col("s_h") && col("item_id") < col("h")), 1)) + 1).as("rank"))
    val nUsers = holdout.agg(count(lit(1)).as("n_users"))
    ranks
      .select(explode(typedlit(ks.map(_.toLong))).as("k"), col("rank"))
      .groupBy(col("k"))
      .agg(count(when(col("rank") <= col("k"), 1)).as("n_hits"))
      .join(spark.createDataFrame(ks.map(k => Tuple1(k.toLong)))
        .toDF("k"), Seq("k"), "right_outer")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .crossJoin(broadcast(nUsers))
      .select(col("k"), col("n_users"), col("n_hits"),
        round(col("n_hits") / col("n_users"), 5).as("hit_rate"))
      .orderBy(col("k"))
  }

  /** Aggregate-diversity report for the co-visitation recommender:
    * what fraction of the catalog ever appears in a top-N list
    * (coverage), and how concentrated the slots are — the
    * most-recommended item's share and the top-decile share (Adomavicius
    * & Kwon 2012's aggregate-diversity lens; a recommender can score
    * high hit-rate while only ever surfacing bestsellers, which
    * [[recHoldoutEval]] alone would never show). Inputs are
    * [[Analytics.itemCooccurrence]]'s top-N lists; every metric is an
    * exact integer ratio over the bounded |items|×N slot frame,
    * rounded once. The decile cut is ceil(|distinct recs|/10) items by
    * (slot count, item id) — deterministic, WindowGroupLimit-bounded.
    */
  def recCoverage(spark: SparkSession, dir: String, topN: Int = 5): DataFrame = {
    val recs = Analytics.itemCooccurrence(spark, dir, topN)
      .select(col("item_id"), col("rec_item_id"))
    val catalog = recs.select(col("item_id")).distinct()
      .agg(count(lit(1)).as("n_catalog"))
    val slots = recs.groupBy(col("rec_item_id")).agg(count(lit(1)).as("n_slots"))
    val totals = slots.agg(count(lit(1)).as("n_recommended"),
      sum(col("n_slots")).as("total_slots"),
      max(col("n_slots")).as("max_slots"))
    val w = Window.orderBy(col("n_slots").desc, col("rec_item_id"))
    val ranked = slots.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(totals))
    val decile = ranked
      .where(col("rk") <= ceil(col("n_recommended") / 10.0))
      .agg(sum(col("n_slots")).as("decile_slots"))
    totals
      .crossJoin(broadcast(decile))
      .crossJoin(broadcast(catalog))
      .select(col("n_catalog"), col("n_recommended"),
        round(col("n_recommended") / col("n_catalog"), 5).as("coverage"),
        col("total_slots"),
        round(col("max_slots") / col("total_slots"), 5).as("max_item_share"),
        round(col("decile_slots") / col("total_slots"), 5).as("top_decile_share"))
  }
}
