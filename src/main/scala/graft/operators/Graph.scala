package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.ScratchCache

/** Graph analytics over the behavioral item graph. Link analysis is a
  * first-class corpus-quality signal at 100 TB (crawl frontiers rank
  * pages by it; recommenders use it as a popularity prior that, unlike
  * raw counts, resists single-user spam); here it runs over the same
  * capped user-item engagement baskets as [[Analytics.itemCooccurrence]].
  */
object Graph {

  /** Mass scale for integer-exact PageRank: ranks are dyadic rationals
    * scaled by 2^34, so `85·Σr` stays far under 2^63 up to ~10^6 nodes
    * (|V|·2^34·85 ≈ 1.4·10^18); a bigger graph halves the scale, it
    * never changes the algorithm.
    */
  private val Scale = 1L << 34

  /** Fixed-iteration PageRank over the item co-engagement graph,
    * computed in EXACT integer arithmetic so every engine replays it
    * bit-for-bit: ranks are 2^34-scaled BIGINTs, each hop contributes
    * `r div deg`, and the damping update is
    * `(15·2^34) div 100 + (85·Σcontrib) div 100` — floor division and
    * BIGINT sums are order-independent, so (unlike float power
    * iteration, whose shuffle-order-dependent partial sums drift
    * between runs and engines) the result is deterministic and the
    * DuckDB oracle unrolls the same `iters` steps. Floor division
    * leaks ≤1/2^34 of mass per hop and dangling nodes keep theirs —
    * both standard fixed-point conventions, documented not corrected.
    *
    * Edges: distinct item pairs co-engaged by a user, baskets over
    * `maxBasket` dropped BEFORE the pair join (the
    * [[Analytics.itemCooccurrence]] cap — bots pay all of the
    * quadratic cost and carry none of the signal).
    *
    * Scale shape: the edge list + out-degrees build once
    * (ScratchCache'd, one scan of events); each of the `iters`
    * rounds is ONE shuffle — an item-keyed broadcast-sized rank join
    * against the cached edges and a map-side-combined contribution
    * sum. Rank state is |items| rows, never corpus-sized; the final
    * top-N is a TakeOrderedAndProject.
    */
  def itemPagerank(spark: SparkSession, dir: String, iters: Int = 8,
                   topN: Int = 25, maxBasket: Int = 500): DataFrame = {
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
      .select(col("user_id"), col("item_id"))
    val edges = ScratchCache.materialize(
      capped.join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
        .where(col("item_id") =!= col("dst"))
        .select(col("item_id").as("src"), col("dst"))
        .distinct())
    val withDeg = ScratchCache.materialize(
      edges.join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src"))
    val nodes = ScratchCache.materialize(capped.select(col("item_id")).distinct())
    val base = (15L * Scale) / 100L
    var ranks = nodes.select(col("item_id"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks.select(col("item_id").as("src"), col("r")), "src")
        .select(col("dst").as("item_id"), expr("r div deg").as("c"))
        .groupBy(col("item_id")).agg(sum(col("c")).as("contrib"))
      // cut per round: every later round re-references the rank state,
      // so an uncut plan accretes one nodes+withDeg subtree per round
      // and Catalyst planning dominates the loop (ScratchCache scaladoc)
      ranks = ScratchCache.materializeCut(nodes.join(contrib, Seq("item_id"), "left")
        .select(col("item_id"),
          (lit(base) + expr("(85 * coalesce(contrib, 0)) div 100")).as("r")))
    }
    ranks
      .select(col("item_id"), col("r").as("rank_scaled"),
        round(col("r") / lit(Scale.toDouble), 6).as("rank"))
      .orderBy(col("rank_scaled").desc, col("item_id"))
      .limit(topN)
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan et
    * al. 2007) over the same co-engagement graph — the
    * related-item-cluster view merchandisers browse and the natural
    * blocking key for within-community recommendation reranks.
    * Classic async LPA is order-dependent; this variant is
    * deterministic by construction: every node starts as its own
    * label, and each of the `iters` rounds updates ALL nodes at once
    * to the most frequent neighbor label with ties broken toward the
    * SMALLER label (count DESC, label ASC — a ranking window with the
    * engine's standard tie order), isolated nodes keeping their own.
    * Integer counts only, so the DuckDB oracle unrolls the same
    * rounds and replays the result exactly.
    *
    * Scale shape: per round, ONE item-keyed join of the |V|-row label
    * state against the ScratchCache'd edge list, a map-side-combined
    * (node, label) count, and a WindowGroupLimit-bounded argmax —
    * state is |V| rows, never corpus-sized (the GraphX/Pregel LPA
    * schedule, expressed relationally).
    */
  def itemCommunities(spark: SparkSession, dir: String, iters: Int = 4,
                      maxBasket: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
      .select(col("user_id"), col("item_id"))
    val edges = ScratchCache.materialize(
      capped.join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
        .where(col("item_id") =!= col("dst"))
        .select(col("item_id").as("src"), col("dst"))
        .distinct())
    val nodes = ScratchCache.materialize(capped.select(col("item_id")).distinct())
    val w = Window.partitionBy(col("src")).orderBy(col("n").desc, col("lab"))
    var labels = nodes.select(col("item_id"), col("item_id").as("lab"))
    for (_ <- 1 to iters) {
      val best = edges
        .join(labels.select(col("item_id").as("dst"), col("lab")), "dst")
        .groupBy(col("src"), col("lab")).agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("src").as("item_id"), col("lab").as("new_lab"))
      // materialize + CUT each round: the update references the
      // previous label state TWICE (neighbor vote + isolated-node
      // carry), so an unmaterialized plan doubles per round; even
      // materialized, the uncut LOGICAL plan grows per round and
      // Catalyst planning dominates (ScratchCache scaladoc). One
      // |V|-row cache entry per round keeps the DAG linear.
      labels = ScratchCache.materializeCut(
        labels.join(best, Seq("item_id"), "left")
          .select(col("item_id"), coalesce(col("new_lab"), col("lab")).as("lab")))
    }
    val sizes = labels.groupBy(col("lab")).agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "lab")
      .select(col("item_id"), col("lab").as("community"), col("community_size"))
      .orderBy(col("item_id"))
  }

  /** Hub diagnostics over the co-engagement graph: the top items by
    * degree with each hub's share of total directed edges — the
    * graph-side twin of [[Curation.keySkew]]'s raw-key report, and
    * the number that decides whether per-item joins ([[itemPagerank]]
    * contributions, [[Analytics.itemCooccurrence]] rankings) need a
    * salt or a cap at the next scale-up. Degree share is an exact
    * int/int double. One map-side-combined degree count over the
    * cached edge list + TakeOrdered.
    */
  def itemHubs(spark: SparkSession, dir: String, topN: Int = 20,
               maxBasket: Int = 500): DataFrame = {
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
      .select(col("user_id"), col("item_id"))
    val edges = ScratchCache.materialize(
      capped.join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
        .where(col("item_id") =!= col("dst"))
        .select(col("item_id").as("src"), col("dst"))
        .distinct())
    val total = edges.agg(count(lit(1)).as("total_edges"))
    edges.groupBy(col("src").as("item_id"))
      .agg(count(lit(1)).as("degree"))
      .crossJoin(broadcast(total))
      .select(col("item_id"), col("degree"),
        (col("degree") / col("total_edges")).as("degree_share"))
      .orderBy(col("degree").desc, col("item_id"))
      .limit(topN)
  }

  /** HITS hubs & authorities (Kleinberg 1999) over the temporally
    * DIRECTED item-flow graph — unlike [[itemPagerank]]'s symmetric
    * co-engagement edges, an edge here is a user moving from item i to
    * item j consecutively in time, weighted by how many transitions
    * took it. Authorities are the items sessions converge ON,
    * hubs the items sessions route THROUGH — the asymmetry a
    * popularity prior misses (merchandising landing pages are hubs,
    * checkout-adjacent items authorities).
    *
    * Exact integer fixed point, the [[itemPagerank]] convention:
    * scores are 2^20-scaled BIGINTs; each half-round is the
    * weighted-neighbor BIGINT sum followed by max-normalization via
    * `v·2^20 div max(v)` (floor division, order-independent), so the
    * DuckDB oracle unrolls the identical `iters` rounds. 2^20 keeps
    * `Σ n·s` under 2^63 up to ~10^12 total transitions; a bigger
    * corpus halves the scale, never the algorithm. Items without
    * out-edges simply carry no hub mass into later rounds (hub 0 in
    * the report), the standard convention.
    *
    * Scale shape: users over `maxEvents` item-events drop BEFORE the
    * lead() window (bot sessions pay the window cost and carry no
    * flow signal); the weighted edge list builds once (ScratchCache,
    * one windowed scan); each round is two item-keyed joins against
    * the cached edges with map-side-combined sums; score state is
    * |items| rows and each round re-materializes so the plan stays
    * linear in `iters`. Final cut is a TakeOrdered.
    */
  def itemFlowHits(spark: SparkSession, dir: String, iters: Int = 4,
                   topN: Int = 20, maxEvents: Int = 2000): DataFrame = {
    val HScale = 1L << 20
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
    val cnt = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val edges = ScratchCache.materialize(
      ev.join(cnt.where(col("c") <= maxEvents), Seq("user_id"))
        .withColumn("nxt", lead(col("item_id"), 1).over(w))
        .where(col("nxt").isNotNull && col("nxt") =!= col("item_id"))
        .groupBy(col("item_id").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("n")))
    if (edges.limit(1).isEmpty) {
      // no consecutive distinct-item transitions: empty result, the
      // oracle's shape (seedless itemPpr precedent)
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("item_id", LongType, nullable = true),
          StructField("authority_scaled", LongType, nullable = true),
          StructField("authority", DoubleType, nullable = true),
          StructField("hub", DoubleType, nullable = true))))
    }
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    var h = nodes.select(col("id"), lit(HScale).as("s"))
    var a: DataFrame = null
    // the max-normalizer is collected per half-round: a 1-row driver
    // artifact (the itemPpr-seed convention) used as a LITERAL, so
    // each round references the previous state exactly ONCE and the
    // unrolled plan stays linear — normalizing via a second reference
    // (crossJoin(broadcast(agg))) doubles the logical plan per round
    // and costs minutes of pure Catalyst time by round 8
    for (_ <- 1 to iters) {
      // cut per half-round: the score state is re-referenced by every
      // later round, and the uncut plan's per-round growth cost more
      // than the actual |E|-row joins (ScratchCache scaladoc)
      val araw = ScratchCache.materializeCut(
        edges.join(h.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("n") * col("s")).as("v")))
      val amax = araw.agg(max(col("v"))).head.getLong(0)
      a = araw.select(col("id"), expr(s"v * $HScale div $amax").as("s"))
      val hraw = ScratchCache.materializeCut(
        edges.join(a.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(sum(col("n") * col("s")).as("v")))
      val hmax = hraw.agg(max(col("v"))).head.getLong(0)
      h = hraw.select(col("id"), expr(s"v * $HScale div $hmax").as("s"))
    }
    a.join(h.withColumnRenamed("s", "hs"), Seq("id"), "left_outer")
      .select(col("id").as("item_id"), col("s").as("authority_scaled"),
        round(col("s") / HScale.toDouble, 5).as("authority"),
        round(coalesce(col("hs"), lit(0L)) / HScale.toDouble, 5).as("hub"))
      .orderBy(col("authority_scaled").desc, col("item_id"))
      .limit(topN)
  }

  /** Global triangle census over the co-engagement graph: triangle
    * count, wedge count and the global clustering coefficient
    * 3·triangles/wedges — the cohesion number that separates
    * community-structured engagement from star-shaped bot traffic.
    *
    * Counting is ORIENTED (Schank-Wagner): undirected edges keep only
    * the src<dst direction, so each triangle a<b<c is enumerated
    * exactly once as (a,b)+(b,c) checked against (a,c) — a wedge join
    * whose per-vertex cost is forward-degree², not raw degree² (the
    * orientation caps hub blowup), followed by one LEFT SEMI. Wedges
    * come from the undirected degree histogram in closed form
    * (deg·(deg−1)/2, exact integer div). Edge list builds once off
    * the capped baskets (ScratchCache) and serves both passes; output
    * is one row.
    */
  def itemTriangles(spark: SparkSession, dir: String,
                    maxBasket: Int = 500): DataFrame = {
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
      .select(col("user_id"), col("item_id"))
    val e = ScratchCache.materialize(
      capped.join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
        .where(col("item_id") < col("dst"))
        .select(col("item_id").as("src"), col("dst"))
        .distinct())
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e2.dst").as("c"))
      .join(e.alias("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val shape = deg.agg(
      count(lit(1)).as("n_items"),
      sum(col("d")).as("deg_sum"),
      sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
    shape.crossJoin(broadcast(tri))
      .select(col("n_items"), expr("deg_sum div 2").as("n_edges"),
        col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 5)
          .as("clustering_coeff"))
  }

  /** k-core of the item co-engagement graph (Seidman 1983): the
    * maximal subgraph where every surviving item keeps ≥ k surviving
    * neighbors — the standard "dense engagement backbone" cut that
    * separates items embedded in real co-purchase structure from
    * long-tail leaves, and the classic preprocessing step before
    * community/embedding passes (peeling leaves first makes both
    * cheaper and cleaner). Computed by synchronous iterative peeling:
    * each round drops every node whose degree WITHIN the current
    * survivor set is < k, all at once. Peeling is monotone (the
    * survivor set only shrinks), so running a FIXED `rounds` count
    * equals the converged fixpoint whenever convergence happens
    * within them — extra rounds are no-ops — which is what lets the
    * oracle unroll the same rounds; the spec asserts convergence at
    * test scale (one extra round removes nothing).
    *
    * Each round references the previous survivor frame exactly ONCE
    * — `deg_a(src) ≥ k` already implies `src ∈ a` (degrees against a
    * shrinking set only fall, so a node dropped earlier can never
    * reach k alive neighbors again), so the src-side membership
    * semi-join is provably redundant and the round is one join + one
    * aggregate. That single reference keeps the unrolled plan LINEAR
    * in `rounds`; the naive both-endpoints formulation doubles the
    * plan per round and at 8 rounds the 2⁸ logical-plan copies OOMed
    * the driver at analysis time (measured). The [[itemPagerank]]
    * lesson, as a rule: per-round state must appear once in the next
    * round's plan. Scale shape: per round, one |V|-row-keyed join
    * against the cached edge list + a map-side-combined count.
    */
  def itemKcore(spark: SparkSession, dir: String, k: Int = 8,
                rounds: Int = 8, maxBasket: Int = 500): DataFrame = {
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
      .select(col("user_id"), col("item_id"))
    val edges = ScratchCache.materialize(
      capped.join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
        .where(col("item_id") =!= col("dst"))
        .select(col("item_id").as("src"), col("dst"))
        .distinct())
    var alive = capped.select(col("item_id")).distinct()
    // degree against alive DST only — the single state reference
    def aliveDeg(a: DataFrame): DataFrame = edges
      .join(a.select(col("item_id").as("dst")), Seq("dst"))
      .groupBy(col("src")).agg(count(lit(1)).as("core_degree"))
    for (_ <- 1 to rounds)
      // single state reference keeps the plan linear; the CUT keeps it
      // CONSTANT — without it each round's plan re-embeds the whole
      // edge-build subtree and planning dominates (ScratchCache scaladoc)
      alive = ScratchCache.materializeCut(
        aliveDeg(alive).where(col("core_degree") >= k)
          .select(col("src").as("item_id")))
    // the final degree table restricts to survivors on BOTH ends —
    // alive is referenced twice here, but only once in total
    val fin = ScratchCache.materialize(alive)
    aliveDeg(fin)
      .join(fin.select(col("item_id").as("src")), Seq("src"), "left_semi")
      .select(col("src").as("item_id"), col("core_degree"))
      .orderBy(col("item_id"))
  }

  /** Personalized PageRank from a single seed item — "related to THIS
    * item through the whole graph", the multi-hop generalization of
    * [[Analytics.itemCooccurrence]]'s one-hop counts (two items never
    * co-engaged by any one user still rank if they share neighbors;
    * random-walk-with-restart is the classic item-graph recommender,
    * e.g. Pixie). Same exact-integer fixed-point as [[itemPagerank]]
    * — 2^34-scaled BIGINT mass, `r div deg` hops, floor-divided 85/15
    * damping — except ALL restart mass returns to the seed (the
    * personalization vector is e_seed), so the stationary mass decays
    * with graph distance from the seed. The seed is the
    * highest-support item (ties to the smaller id) — deterministic
    * and replayable; pass `seedItem` to pin one. Per round: ONE
    * item-keyed join of the |V|-row rank state against the cached
    * edges + a map-side-combined sum; DuckDB unrolls the same rounds.
    */
  def itemPpr(spark: SparkSession, dir: String, iters: Int = 6,
              topN: Int = 25, maxBasket: Int = 500,
              seedItem: Option[Long] = None): DataFrame = {
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ScratchCache.materialize(
      ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
        .select(col("user_id"), col("item_id")))
    val edges = ScratchCache.materialize(
      capped.join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
        .where(col("item_id") =!= col("dst"))
        .select(col("item_id").as("src"), col("dst"))
        .distinct())
    val withDeg = ScratchCache.materialize(
      edges.join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src"))
    val nodes = ScratchCache.materialize(capped.select(col("item_id")).distinct())
    val seedOpt: Option[Long] = seedItem.orElse {
      capped.groupBy(col("item_id")).agg(count(lit(1)).as("supp"))
        .orderBy(col("supp").desc, col("item_id")).limit(1)
        .collect().headOption.map(_.getLong(0))
    }
    if (seedOpt.isEmpty) {
      // no view/click/purchase event carries an item ref: match the
      // SQL oracle's empty result instead of throwing on .head
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("seed_item", LongType, nullable = false),
          StructField("item_id", LongType, nullable = true),
          StructField("rank_scaled", LongType, nullable = true),
          StructField("rank", DoubleType, nullable = true))))
    }
    val seed: Long = seedOpt.get
    val Scale = 1L << 34
    val base = (15L * Scale) / 100L
    var ranks = nodes.select(col("item_id"),
      when(col("item_id") === seed, lit(Scale)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks.select(col("item_id").as("src"), col("r")), "src")
        .select(col("dst").as("item_id"), expr("r div deg").as("c"))
        .groupBy(col("item_id")).agg(sum(col("c")).as("contrib"))
      // cut per round — same planning-growth control as itemPagerank
      ranks = ScratchCache.materializeCut(nodes.join(contrib, Seq("item_id"), "left")
        .select(col("item_id"),
          (when(col("item_id") === seed, lit(base)).otherwise(lit(0L)) +
            expr("(85 * coalesce(contrib, 0)) div 100")).as("r")))
    }
    ranks
      .select(lit(seed).as("seed_item"), col("item_id"), col("r").as("rank_scaled"),
        round(col("r") / lit(Scale.toDouble), 6).as("rank"))
      .where(col("rank_scaled") > 0)
      .orderBy(col("rank_scaled").desc, col("item_id"))
      .limit(topN)
  }

  /** Deterministic random-walk corpus over the item co-engagement
    * graph — the DeepWalk/node2vec training-data generator (Perozzi et
    * al., KDD'14): `walksPerNode` truncated walks of `steps` hops from
    * every node, emitted long-form as (seed_item, walk_no, pos,
    * item_id) rows ready for a skip-gram trainer. The "random" step is
    * a HASH, not an RNG: at position t the walk at node v takes the
    * neighbor whose dense rank (by dst id) equals
    * `u32(md5(seed:walk:t:v)) mod deg(v)` — every engine replays the
    * exact same walks, so the corpus carries a hard SQL oracle (the
    * unrolled-join pattern of [[itemPpr]]) AND a re-run of the 100 TB
    * job is reproducible shard-by-shard, which a sampling RNG seeded
    * per-task is not.
    *
    * Scale shape: the neighbor table builds once (two windows over the
    * same src partition — one shuffle — bounded by per-node degree,
    * never |V|); each hop is ONE item-keyed equi-join of the walk
    * state (|V|·walksPerNode rows, constant across hops) against the
    * cached neighbor list, with the mod-hash selection as a post-join
    * one-in-deg filter. Cost is `steps` sequential joins, volume
    * |V|·W·deg map-side, |V|·W reduce-side — linear in nodes, never
    * corpus-sized. Nodes whose only engagements sit in singleton
    * baskets have no out-edges: their walks end at pos 0 (truncated,
    * not padded), the standard DeepWalk convention for sinks.
    */
  def graphWalks(spark: SparkSession, dir: String, steps: Int = 4,
                 walksPerNode: Int = 2, maxBasket: Int = 500): DataFrame =
    graphWalksRaw(spark, dir, steps, walksPerNode, maxBasket)
      .orderBy(col("seed_item"), col("walk_no"), col("pos"))

  /** [[graphWalks]] WITHOUT the presentation sort — the frame
    * [[walkSkipgrams]] consumes (its self-join and aggregate are
    * order-independent, and materializing a globally sorted frame
    * would pay a needless full sort — guide §2.4 "an orderBy used only
    * to make output deterministic").
    */
  private def graphWalksRaw(spark: SparkSession, dir: String, steps: Int,
                            walksPerNode: Int, maxBasket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
      .select(col("user_id"), col("item_id"))
    val edges = capped
      .join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
      .where(col("item_id") =!= col("dst"))
      .select(col("item_id").as("src"), col("dst"))
      .distinct()
    val wSrc = Window.partitionBy(col("src"))
    val nbr = ScratchCache.materialize(edges
      .withColumn("idx", row_number().over(wSrc.orderBy(col("dst"))).cast("long") - 1)
      .withColumn("deg", count(lit(1)).over(wSrc)))
    val nodes = capped.select(col("item_id")).distinct()
    val state0 = nodes
      .crossJoin(broadcast(spark.range(walksPerNode.toLong).toDF("walk_no")))
      .select(col("item_id").as("seed_item"), col("walk_no"),
        col("item_id").as("cur"))
    var state = state0
    var out = state0.select(col("seed_item"), col("walk_no"),
      lit(0L).as("pos"), col("cur").as("item_id"))
    for (t <- 0 until steps) {
      val h = conv(substring(md5(concat_ws(":",
        col("seed_item"), col("walk_no"), lit(t), col("cur"))), 1, 8), 16, 10)
        .cast("long")
      // cut per step (the iterative-loop convention, ScratchCache
      // scaladoc): without it each union leg re-embeds every earlier
      // step's join subtree, so the walk executed O(steps²/2) joins —
      // step t's state is referenced by BOTH the output leg and step
      // t+1, and only a materialization barrier makes it compute once
      state = ScratchCache.materializeCut(state
        .join(nbr, col("cur") === col("src") && col("idx") === h % col("deg"))
        .select(col("seed_item"), col("walk_no"), col("dst").as("cur")))
      out = out.unionByName(state.select(col("seed_item"), col("walk_no"),
        lit(t + 1L).as("pos"), col("cur").as("item_id")))
    }
    out
  }

  /** node2vec biased walks — the second-order upgrade of
    * [[graphWalks]] (Grover & Leskovec, KDD 2016): the step out of
    * `cur` remembers `prev` and weights each candidate x by the
    * search bias α — return (x = prev), common neighbor
    * (edge prev→x exists), or far — before drawing. The weights are
    * INTEGERS (defaults 1/2/1 ≡ p = q = 2, the BFS-leaning "local
    * view" setting; any positive integers plug in), and the draw is
    * the hash r = u32(md5(seed:walk:t:cur)) mod Σw landed on the
    * candidate whose cumulative-weight interval contains r, candidates
    * in dst order — so the biased sampling is exactly replayable, and
    * the FIRST step (no prev, sentinel −1 matches nothing → all
    * weights wFar) degenerates to [[graphWalks]]' uniform draw.
    *
    * Scale shape: per hop ONE item-keyed join of the constant-size
    * walk state against the cached neighbor table plus a left join
    * against the edge set for the dist-1 test — both keyed, both
    * bounded by capped degree; the cumulative window partitions by
    * (seed, walk), never globally. Like DeepWalk's, the corpus
    * regenerates reproducibly shard-by-shard.
    */
  def node2vecWalks(spark: SparkSession, dir: String, steps: Int = 4,
                    walksPerNode: Int = 2, maxBasket: Int = 500,
                    wReturn: Int = 1, wCommon: Int = 2,
                    wFar: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(wReturn > 0 && wCommon > 0 && wFar > 0, "weights must be positive")
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
      .select(col("user_id"), col("item_id"))
    val edges = ScratchCache.materialize(capped
      .join(capped.select(col("user_id"), col("item_id").as("dst")), Seq("user_id"))
      .where(col("item_id") =!= col("dst"))
      .select(col("item_id").as("src"), col("dst"))
      .distinct())
    val nodes = capped.select(col("item_id")).distinct()
    val state0 = nodes
      .crossJoin(broadcast(spark.range(walksPerNode.toLong).toDF("walk_no")))
      .select(col("item_id").as("seed_item"), col("walk_no"),
        lit(-1L).as("prev"), col("item_id").as("cur"))
    var state = state0
    var out = state0.select(col("seed_item"), col("walk_no"),
      lit(0L).as("pos"), col("cur").as("item_id"))
    val wp = Window.partitionBy(col("seed_item"), col("walk_no"))
    for (t <- 0 until steps) {
      val cands = state
        .join(edges, col("cur") === col("src"))
        .join(edges.select(col("src").as("p2"), col("dst").as("d2"), lit(1).as("comm")),
          col("prev") === col("p2") && col("dst") === col("d2"), "left_outer")
        .withColumn("w",
          when(col("dst") === col("prev"), lit(wReturn.toLong))
            .when(col("comm").isNotNull, lit(wCommon.toLong))
            .otherwise(lit(wFar.toLong)))
      val h = conv(substring(md5(concat_ws(":",
        col("seed_item"), col("walk_no"), lit(t), col("cur"))), 1, 8), 16, 10)
        .cast("long")
      // cut per step — same O(steps²) union-leg re-execution control
      // as graphWalks (doubly important here: each step runs two
      // joins and two windows)
      state = ScratchCache.materializeCut(cands
        .withColumn("cum", sum(col("w")).over(wp.orderBy(col("dst"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("r", h % sum(col("w")).over(wp))
        .where(col("cum") - col("w") <= col("r") && col("r") < col("cum"))
        .select(col("seed_item"), col("walk_no"),
          col("cur").as("prev"), col("dst").as("cur")))
      out = out.unionByName(state.select(col("seed_item"), col("walk_no"),
        lit(t + 1L).as("pos"), col("cur").as("item_id")))
    }
    out.orderBy(col("seed_item"), col("walk_no"), col("pos"))
  }

  /** SGNS negative sampling — the third leg of the word2vec training
    * stack (walks → skip-gram pairs → negatives): k negatives per
    * (center, context) pair drawn from the unigram^0.75 distribution
    * (Mikolov et al., NIPS 2013 §2.2), deterministically. Two design
    * moves make it exact and scalable:
    *
    *   - the ¾-power weight is computed POW-FREE as
    *     `floor(sqrt(c)·sqrt(sqrt(c))·1024)` — IEEE sqrt is
    *     correctly-rounded in every engine where `pow` is not, so the
    *     integer weights (and everything cumulated from them) are
    *     bit-identical across engines;
    *   - the draw goes through a BUCKETIZED alias table: items claim
    *     disjoint bucket ranges [⌊cum·B/Z⌋, ⌊(cum+w)·B/Z⌋) of B=4096
    *     buckets (consecutive floors — no gaps, no overlaps), and a
    *     draw is `u32(md5(center:context:j)) mod B` EQUI-joined to
    *     its bucket. Production samplers use alias tables for the
    *     same reason: the per-draw cost must be a hash lookup, never
    *     a cum-interval range probe (a broadcast range join is
    *     O(pairs·items) — the scale-killer this avoids). Bucket
    *     quantization skews tail probabilities by ≤ Z/B relative —
    *     raise B if the tail matters.
    *
    * The cumulative sums shard by `item mod 64`: per-shard windows
    * (partitioned, degree-bounded) plus a 64×64 triangle self-join
    * for shard offsets — no unpartitioned window anywhere. Items
    * whose quantized range is empty are simply never drawn
    * (documented tail loss); accidental hits (negative = center or
    * context) are kept, the word2vec convention.
    */
  def sgnsNegatives(spark: SparkSession, dir: String, kNeg: Int = 3,
                    buckets: Int = 4096, steps: Int = 4,
                    walksPerNode: Int = 2, window: Int = 2,
                    maxBasket: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .distinct()
    val deg0 = ui.groupBy(col("user_id")).agg(count(lit(1)).as("basket"))
    val capped = ui.join(deg0.where(col("basket") <= maxBasket), Seq("user_id"))
    val w = capped.groupBy(col("item_id"))
      .agg(count(lit(1)).as("c"))
      .withColumn("w", floor(sqrt(col("c")) * sqrt(sqrt(col("c"))) * 1024)
        .cast("long"))
      .withColumn("shard", col("item_id") % 64)
    val ws = Window.partitionBy(col("shard")).orderBy(col("item_id"))
    val inShard = w.withColumn("cb_shard",
      coalesce(sum(col("w")).over(ws.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = w.groupBy(col("shard")).agg(sum(col("w")).as("tot"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.shard") < col("a.shard"), "left_outer")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.tot")), lit(0L)).as("off"))
    val z = w.agg(sum(col("w")).as("z"))
    val ranges = inShard.join(broadcast(offsets), "shard")
      .crossJoin(broadcast(z))
      .select(col("item_id"),
        expr(s"(cb_shard + off) * $buckets div z").as("lo"),
        expr(s"(cb_shard + off + w) * $buckets div z").as("hi"))
    val bucketTable = ranges.where(col("hi") > col("lo"))
      .select(col("item_id"), explode(expr("sequence(lo, hi - 1)")).as("bucket"))
    val pairs = walkSkipgrams(spark, dir, window, steps, walksPerNode, maxBasket)
      .select(col("center"), col("context")).distinct()
    val draws = pairs.crossJoin(
      broadcast(spark.range(1, kNeg + 1L).toDF("neg_no")))
      .withColumn("bucket", conv(substring(md5(concat_ws(":",
        col("center"), col("context"), col("neg_no"))), 1, 8), 16, 10)
        .cast("long") % buckets)
    draws.join(broadcast(bucketTable), "bucket")
      .select(col("center"), col("context"), col("neg_no"),
        col("item_id").as("neg_item"))
      .orderBy(col("center"), col("context"), col("neg_no"))
  }

  /** Skip-gram pairs from the walk corpus — the last mile of the
    * DeepWalk pipeline (Perozzi et al. KDD'14 §4.2; word2vec's
    * (center, context) extraction with window `window` applied to
    * [[graphWalks]]' paths): every ordered pair of walk positions at
    * distance 1..window becomes one training row, weighted nothing —
    * the trainer downweights by distance if it wants to (the emitted
    * `dist` column carries |pos−pos'|). Self-pairs (the walk revisits
    * a node inside the window) are kept: that IS the distributional
    * signal of a tight cluster.
    *
    * Scale shape: one self-join of the walk corpus keyed by
    * (seed, walk) — each side is |V|·W·(L+1) rows and the join key is
    * a walk id, so fan-out per key is (L+1)·window ≤ a constant; the
    * output aggregate (center, context, dist) → n_pairs is
    * map-side-combinable. No windows, no global order.
    */
  def walkSkipgrams(spark: SparkSession, dir: String, window: Int = 2,
                    steps: Int = 4, walksPerNode: Int = 2,
                    maxBasket: Int = 500): DataFrame = {
    // UNSORTED walk corpus, materialized once: the self-join below
    // reads it twice, and [[sgnsNegatives]] composes on top — without
    // the barrier the whole multi-step walk recomputed per reference
    // (and the presentation orderBy would add a full sort per pass)
    val walks = ScratchCache.materialize(
      graphWalksRaw(spark, dir, steps, walksPerNode, maxBasket))
    val a = walks.select(col("seed_item"), col("walk_no"),
      col("pos"), col("item_id").as("center"))
    val b = walks.select(col("seed_item"), col("walk_no"),
      col("pos").as("pos2"), col("item_id").as("context"))
    a.join(b, Seq("seed_item", "walk_no"))
      .where(col("pos") =!= col("pos2") &&
        abs(col("pos") - col("pos2")) <= window)
      .groupBy(col("center"), col("context"),
        abs(col("pos") - col("pos2")).as("dist"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("center"), col("context"), col("dist"))
  }
}
