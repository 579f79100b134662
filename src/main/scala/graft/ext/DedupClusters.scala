package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: turns a pair list (from any of the
  * near-dup detectors) into connected components, so a pipeline can
  * keep exactly one representative per duplicate cluster — the final
  * step of corpus dedup.
  *
  * Algorithm: min-label propagation. Every node starts labeled with
  * its own id; each round every node takes the minimum label among
  * itself and its neighbors; at fixpoint the label is the component's
  * minimum id. Each round is one join + one aggregation — the
  * standard Spark-native connected-components shape (no graph
  * library needed). Label values only decrease, so `maxIterations`
  * rounds are exact for any component whose graph diameter is below
  * that; near-dup clusters are overwhelmingly small cliques
  * (diameter 1-2), and the convergence check stops early when a
  * round changes nothing.
  *
  * Scale posture: each round shuffles (edges ⋈ labels) — both keyed
  * by node id, hash-uniform. The edge list is the pairs output,
  * which dedup thresholds keep tiny relative to the corpus.
  */
object DedupClusters {

  /** (doc_id, cluster_id) for every node of `nodes`; nodes that
    * appear in no pair are their own singleton cluster.
    *
    * `pairs` must have two id columns (`aCol`, `bCol`). */
  def clusters(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIterations: Int = 10): DataFrame = {
    // symmetric edge list, cached: reused every round
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()

    var labels = nodes.select(col(idCol).as("node"))
      .distinct()
      .withColumn("label", col("node"))
    var converged = false
    var i = 0
    while (i < maxIterations && !converged) {
      // (loop body below; non-convergence is an ERROR at the end —
      // silently returning split clusters would make downstream
      // keep-one-per-cluster emit duplicate "representatives")
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("label", "dst_label"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("dst_label")).as("nbr_label"))
      // localCheckpoint, not cache: `labels` feeds BOTH the neighbor
      // aggregation and the join-back, so without lineage truncation
      // the logical plan more than doubles every round — by round 10
      // (a diameter-10 component) the plan tree is 2^10 nodes and
      // planning/plan-stringification dominates, then OOMs. Eager
      // local checkpointing pins each round's result as the new leaf:
      // O(1) plan depth per round. (Trade-off: checkpoint blocks are
      // not recomputable on executor loss — a lost block fails the
      // job and the caller reruns; acceptable for a bounded-round
      // refinement loop, and the alternative — reliable checkpoint()
      // — costs a distributed-FS write per round.)
      val next = labels
        .join(neighborMin, Seq("node"), "left")
        .withColumn("new_label", least(col("label"), coalesce(col("nbr_label"), col("label"))))
        .select(col("node"), col("new_label").as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .where(col("label") =!= col("old")).limit(1).count() > 0
      labels.unpersist()
      labels = next
      converged = !changed
      i += 1
    }
    edges.unpersist()
    // one line of operational evidence: rounds == diameter + 1 (the
    // final no-change confirmation), the term the maxIterations
    // contract bounds
    System.err.println(s"[clusters] label propagation converged=$converged rounds=$i")
    if (!converged) {
      labels.unpersist()
      sys.error(
        s"label propagation did not converge in $maxIterations rounds — a " +
          "component's diameter exceeds the bound. Raise maxIterations, or " +
          "use clustersLocal (exact for any diameter when pairs fit the driver).")
    }
    // NOTE: the returned labels are backed by the last round's local
    // checkpoint blocks; they are reclaimed by the ContextCleaner once
    // the dataset is unreferenced (Sessions.settle hurries that along).
    labels.select(col("node").as(idCol), col("label").as("cluster_id"))
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC '14) — the scalable answer for adversarial topologies:
    * min-label propagation needs O(diameter) rounds (a length-d chain
    * costs d joins), these star moves provably converge in
    * O(log² n) rounds on ANY graph by actively shrinking long paths
    * instead of walking them.
    *
    * Per round, over the canonical undirected edge set:
    *  - large-star: every node u connects each STRICTLY LARGER
    *    neighbor to m(u) = min(Γ(u) ∪ {u}),
    *  - small-star: every node u connects its smaller neighbors and
    *    itself to the minimum of those.
    * At fixpoint (edge set unchanged) every component is a star
    * centered on its minimum id — the labels read straight off the
    * edges. Same output contract as [[clusters]]: (id, cluster_id =
    * component minimum), singletons included; any orderable id type.
    *
    * Scale posture: each half-round is one aggregation + one join on
    * node ids (hash-uniform) over the CURRENT edge set, which the
    * star moves keep collapsing toward one-edge-per-node; per-round
    * localCheckpoint pins O(1) plan depth like [[clusters]]. */
  def clustersAlternating(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIterations: Int = 50): DataFrame = {
    def canonical(df: DataFrame): DataFrame =
      df.where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()

    var e = canonical(
        pairs.select(col(aCol).as("u"), col(bCol).as("v")))
      .localCheckpoint(true)
    var converged = e.isEmpty
    var i = 0
    while (i < maxIterations && !converged) {
      // large-star over the symmetric adjacency: (y, m(x)) for y > x.
      // m(x) ≤ x < y keeps the output canonical by construction.
      val sym = e.select(col("u").as("x"), col("v").as("y"))
        .union(e.select(col("v").as("x"), col("u").as("y")))
      val mLarge = sym.groupBy("x")
        .agg(min(col("y")).as("mn"))
        .select(col("x"), least(col("mn"), col("x")).as("m"))
      val large = canonical(sym.join(mLarge, "x")
        .where(col("y") > col("x"))
        .select(col("y").as("u"), col("m").as("v")))
        .localCheckpoint(true)
      // small-star over the canonical (u > v) orientation: u and each
      // smaller neighbor v ≠ mn connect to mn = min of the smaller
      // neighborhood (all < u, so outputs stay canonical).
      val mSmall = large.groupBy("u").agg(min(col("v")).as("mn"))
      val small = canonical(
        mSmall.select(col("u"), col("mn").as("v"))
          .unionByName(large.join(mSmall, "u")
            .where(col("v") =!= col("mn"))
            .select(col("v").as("u"), col("mn").as("v"))))
        .localCheckpoint(true)
      val changed = small.count() != e.count() ||
        small.exceptAll(e).limit(1).count() > 0
      e = small
      converged = !changed
      i += 1
    }
    System.err.println(s"[clustersAlternating] converged=$converged rounds=$i")
    require(converged,
      s"star contraction did not converge in $maxIterations rounds " +
        "(bound is O(log² n) — this indicates ids that mutate under " +
        "greatest/least, e.g. mixed numeric types; normalize the id column)")
    // fixpoint stars: every edge is (member, center); centers and
    // untouched nodes label themselves
    val labels = e.select(col("u").as("__node"), col("v").as("__cl"))
      .groupBy("__node").agg(min(col("__cl")).as("__cl"))
    nodes.select(col(idCol))
      .join(labels, col(idCol) === col("__node"), "left")
      .select(col(idCol),
        coalesce(col("__cl"), col(idCol)).as("cluster_id"))
  }

  /** Exact connected components with the pair list collected to the
    * driver (union-find with path compression, min-id
    * representative), labels broadcast back.
    *
    * This is the right tool when pairs ≪ corpus — the normal dedup
    * regime: a duplicate-pair list is bounded by the duplicate rate,
    * not the corpus size, so even a 100 TB corpus with 1% near-dups
    * yields a driver-manageable pair list. One shuffle-free broadcast
    * join replaces O(diameter) iterative shuffle rounds (the
    * distributed [[clusters]] above stays for adversarial pair sets
    * too large to collect). Exact for any graph shape — no diameter
    * bound.
    */
  def clustersLocal(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    // integral ids only — a silent cast of string ids to long would
    // null out and NPE; the distributed clusters() is type-generic
    Seq(aCol, bCol).foreach { c =>
      val dt = pairs.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType,
        s"clustersLocal needs integral ids; $c is $dt — use clusters() for other id types")
    }
    val edgeList = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    clustersFromEdges(nodes, edgeList, idCol)
  }

  /** Driver union-find over an already-collected edge list. */
  private def clustersFromEdges(
      nodes: DataFrame,
      edgeList: Array[(Long, Long)],
      idCol: String): DataFrame = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent.getOrElse(root, root)
      var cur = x // path compression
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // min-id root ⇒ cluster_id = component minimum, matching
        // the label-propagation fixpoint
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    // SNAPSHOT the keys before mapping: find()'s path-compression
    // writes back into `parent` during the traversal, and iterating
    // the live keySet view while the map is written loses elements
    // (observed: 4 of 11 labels silently dropped). An Array detaches
    // the iteration from the map entirely.
    val labels = parent.keys.toArray.map(n => (n, find(n))).toSeq

    val spark = nodes.sparkSession
    import spark.implicits._
    val labelDf = broadcast(labels.toDF(idCol, "__cl"))
    nodes.select(col(idCol))
      .join(labelDf, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__cl"), col(idCol)).as("cluster_id"))
  }

  /** Corpus dedup, end to end: near-dup pairs → clusters → keep the
    * min-id document of every cluster. `pairs` from any detector
    * (MinHashLSH, SimHash, ngram, embedding). */
  /** Pair-count cap above which [[keepOnePerCluster]] refuses the
    * driver-collect path. Collecting is only safe when pairs ≪ corpus;
    * an adversarial corpus (e.g. boilerplate-heavy crawl deduped
    * before boilerplate removal) can emit near-quadratic pair lists
    * that would OOM the driver. */
  val LocalPairLimit: Long = 2000000L

  def keepOnePerCluster(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      localPairLimit: Long = LocalPairLimit): DataFrame = {
    // exact driver union-find when the id type allows it AND the pair
    // volume is provably bounded (the normal pairs ≪ corpus regime:
    // one broadcast join, any graph diameter); the alternating-star
    // contraction otherwise — distributed, and its O(log² n) round
    // bound holds on ANY topology, so the adversarial regime (pair
    // lists too big to collect, whose shape nobody audited) no longer
    // rides label propagation's diameter contract. The volume probe
    // IS the collect — limit(N+1) stops the scan at N+1 rows, so an
    // adversarial near-quadratic pair set costs one O(N) probe pass
    // before falling back, and the normal case pays a single pass.
    val idType = docs.schema(idCol).dataType
    val integral = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType ||
      idType == org.apache.spark.sql.types.ShortType
    val cap = math.min(localPairLimit, (Int.MaxValue - 1).toLong).toInt
    val cl =
      if (integral) {
        val probed = pairs
          .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
          .limit(cap + 1).collect()
        if (probed.length <= cap)
          clustersFromEdges(docs, probed.map(r => (r.getLong(0), r.getLong(1))), idCol)
        else clustersAlternating(docs, pairs, idCol)
      } else clustersAlternating(docs, pairs, idCol)
    val w = Window.partitionBy(col("cluster_id")).orderBy(col(idCol))
    docs.join(cl, Seq(idCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "cluster_id")
  }
}
