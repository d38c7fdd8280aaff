package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Per-superstep lineage/metrics row (north_rule: "checkpointed every k
  * supersteps with per-partition lineage and metrics"). */
final case class SuperstepMetric(kernel: String, superstep: Int, millis: Long,
                                 edgesScanned: Long, partitions: Int, maxDelta: Double)

/**
 * Link-graph kernels over a generic Long-id edge table `(src, dst)`,
 * expressed as iterative DataFrame joins + aggregations under Catalyst
 * (north_star: no GraphX/RDD kernels). The reference delegates these
 * analytics to Neo4j after export; here they are native (SURVEY §2.9).
 *
 * Scale decisions:
 *  - edges are hash-repartitioned by `src` ONCE and persisted; every
 *    superstep's rank/label join then reuses that exchange, so the per-
 *    iteration cost is one shuffle of the (small) vertex-state table plus
 *    the aggregation — not a re-shuffle of the edge table;
 *  - lineage is cut every `checkpointEvery` supersteps via localCheckpoint
 *    (plan-size blowup, SURVEY §4.3-1) and optionally persisted to a
 *    checkpoint dir with a manifest for mid-convergence resume;
 *  - AQE handles residual skew; triangle counting uses degree-ordered
 *    orientation so hub vertices don't quadratically explode wedges.
 */
object GraphOps {

  /** Deterministic dense Long ids for string vertices: sort + zipWithIndex
    * (distributed, stable across partitionings). */
  def vertexDictionary(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    val sorted = ids.select(col(ids.columns.head).cast("string").as("vid"))
      .distinct().orderBy("vid")
    val indexed = sorted.as[String].rdd.zipWithIndex().map { case (v, i) => (v, i) }
    spark.createDataFrame(indexed).toDF("vid", "id")
  }

  /** Map a string edge table to Long ids using one dictionary for both ends. */
  def indexEdges(spark: SparkSession, edges: DataFrame, srcCol: String, dstCol: String): (DataFrame, DataFrame) = {
    val dict = vertexDictionary(spark,
      edges.select(col(srcCol).as("v")).union(edges.select(col(dstCol).as("v"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = edges
      .join(dict.withColumnRenamed("vid", srcCol).withColumnRenamed("id", "src"), srcCol)
      .join(dict.withColumnRenamed("vid", dstCol).withColumnRenamed("id", "dst"), dstCol)
      .select("src", "dst")
    (e, dict)
  }

  // ------------------------------------------------------------------ PageRank

  final case class PageRankResult(ranks: DataFrame, metrics: Seq[SuperstepMetric], supersteps: Int)

  /**
   * Iterative PageRank: rank = (1-d)/N + d * (sum of contributions
   * [+ dangling mass / N when redistributeDangling]). Converges to the
   * standard per-vertex scores (allclose 1e-6 against a naive oracle —
   * float summation order is the only divergence source, SURVEY §7.4-2).
   *
   * @param tol       stop when max |delta| < tol (checked at checkpoint
   *                  boundaries to avoid a per-superstep action); <=0 = fixed
   *                  iteration count.
   * @param checkpointDir directory for resumable state; on restart, pass the
   *                  same dir to [[resumePageRank]].
   */
  def pageRank(spark: SparkSession, edges: DataFrame, iterations: Int,
               damping: Double = 0.85, redistributeDangling: Boolean = true,
               tol: Double = 0.0, checkpointEvery: Int = 5,
               checkpointDir: Option[String] = None,
               startRanks: Option[DataFrame] = None, startSuperstep: Int = 0): PageRankResult = {
    import spark.implicits._
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // AQE re-plans every superstep and its partition coalescing breaks the
    // co-partitioning reuse between ranks/outDeg/edges (measured 3x slower
    // with AQE on). Iterative kernels run with it off, restored afterwards.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {

    // Partition edges by src once; reused every superstep.
    val e = edges.select($"src".cast("long"), $"dst".cast("long"))
      .repartition(shufflePartitions, $"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = e.count()

    val vertices = e.select($"src".as("id")).union(e.select($"dst".as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count()

    val outDeg = e.groupBy($"src").agg(count(lit(1)).as("outDeg"))
      .repartition(shufflePartitions, $"src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Eager localCheckpoint: materializes AND truncates the *logical* plan.
    // Persist alone is not enough for iterative plans — Catalyst re-analyzes
    // the whole (exponentially growing) lineage every superstep otherwise.
    var ranks = startRanks.getOrElse(vertices.withColumn("rank", lit(1.0 / n)))
      .repartition(shufflePartitions, $"id")
      .localCheckpoint(true)

    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetric]
    val edgePartitions = e.rdd.getNumPartitions
    var step = startSuperstep
    var converged = false

    while (step < iterations && !converged) {
      val t0 = System.nanoTime()
      val withDeg = ranks
        .join(outDeg.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select($"id", $"rank", coalesce($"outDeg", lit(0L)).as("outDeg"))

      // Dangling mass (rank held by vertices with no out-edges) stays inside
      // the plan: a 1-row aggregate crossJoined (broadcast) into the update,
      // so each superstep is a single job — no extra driver round-trip.
      val dangling =
        if (redistributeDangling)
          withDeg.filter($"outDeg" === 0).agg((coalesce(sum($"rank"), lit(0.0)) / n).as("dm"))
        else spark.range(1).select(lit(0.0).as("dm"))

      val contribs = withDeg.filter($"outDeg" > 0)
        .withColumnRenamed("id", "src")
        .join(e, Seq("src"))
        .select($"dst".as("id"), ($"rank" / $"outDeg").as("contrib"))
        .groupBy($"id").agg(sum($"contrib").as("contrib"))

      // The groupBy above already hash-partitions contribs by id, and
      // `vertices` was cached with the same partitioning — the join and the
      // broadcast crossJoin preserve it, so each superstep is exactly one
      // exchange (the contribution aggregation).
      //
      // Lineage is cut EVERY superstep (localCheckpoint truncates the
      // logical plan to a LogicalRDD immediately, guarding the Catalyst
      // re-analysis blowup fixed in 8d12bfb) but MATERIALIZED only at
      // checkpoint boundaries (eager=false otherwise): k supersteps run as
      // one job instead of k, with every intermediate persisted during that
      // job by its localCheckpoint mark.
      step += 1
      val atCheckpoint = step % checkpointEvery == 0 || step == iterations
      val newRanks = vertices
        .join(contribs, Seq("id"), "left")
        .crossJoin(dangling)
        .select($"id",
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce($"contrib", lit(0.0)) + $"dm")).as("rank"))
        .localCheckpoint(atCheckpoint)
      var maxDelta = Double.NaN
      if (atCheckpoint) {
        if (tol > 0) {
          maxDelta = newRanks.join(ranks.withColumnRenamed("rank", "prev"), "id")
            .agg(max(abs($"rank" - $"prev"))).as[Double].head()
          if (maxDelta < tol) converged = true
        }
        checkpointDir.foreach(dir => writeCheckpoint(spark, dir, "pagerank", step, newRanks))
      }
      ranks = newRanks
      metrics += SuperstepMetric("pagerank", step, (System.nanoTime() - t0) / 1000000L,
        edgeCount, edgePartitions, maxDelta)
    }

    e.unpersist(false); outDeg.unpersist(false); vertices.unpersist(false)
    PageRankResult(ranks.select($"id", $"rank"), metrics.toSeq, step)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  /** Resume PageRank mid-convergence from the latest checkpoint in `dir`. */
  def resumePageRank(spark: SparkSession, edges: DataFrame, iterations: Int, dir: String,
                     damping: Double = 0.85, redistributeDangling: Boolean = true,
                     tol: Double = 0.0, checkpointEvery: Int = 5): PageRankResult = {
    val (step, ranks) = readLatestCheckpoint(spark, dir, "pagerank")
    pageRank(spark, edges, iterations, damping, redistributeDangling, tol, checkpointEvery,
      Some(dir), startRanks = Some(ranks), startSuperstep = step)
  }

  /** Small-file IO through the Hadoop FileSystem so checkpoints work on any
    * FS the parquet snapshots land on (HDFS/S3A/local), not just the
    * driver-local filesystem. */
  private def fsWrite(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def fsRead(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Latest checkpointed superstep in `dir` for `kernel`, if any. */
  def latestCheckpoint(spark: SparkSession, dir: String, kernel: String = "pagerank"): Option[Int] =
    fsRead(spark, s"$dir/$kernel/LATEST").map(_.trim.toInt)

  def clearCheckpoints(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  private def writeCheckpoint(spark: SparkSession, dir: String, kernel: String,
                              step: Int, state: DataFrame): Unit = {
    val path = s"$dir/$kernel/superstep=$step"
    state.write.mode("overwrite").parquet(path)
    val rows = state.count()
    val manifest =
      s"""{"kernel": "$kernel", "superstep": $step, "rows": $rows, "partitions": ${state.rdd.getNumPartitions}}"""
    fsWrite(spark, s"$dir/$kernel/MANIFEST-$step.json", manifest)
    fsWrite(spark, s"$dir/$kernel/LATEST", step.toString)
  }

  private def readLatestCheckpoint(spark: SparkSession, dir: String, kernel: String): (Int, DataFrame) = {
    val step = latestCheckpoint(spark, dir, kernel)
      .getOrElse(throw new IllegalStateException(s"no $kernel checkpoint in $dir"))
    (step, spark.read.parquet(s"$dir/$kernel/superstep=$step"))
  }

  // ------------------------------------------------- connected components

  /**
   * Connected components by alternating large-star / small-star contraction
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14). Exact (north_rule: components match exactly): converges to
   * star graphs rooted at each component's minimum vertex id in O(log n)
   * rounds.
   *
   * Why not min-label propagation with pointer jumping: that formulation
   * self-joins the label table on `label`, and as components coalesce the
   * giant component's label becomes a single hot key holding a constant
   * fraction of ALL rows — an unsplittable straggler at 100x scale. Here
   * every shuffle keys on the *vertex* id, so per-task work is bounded by
   * max vertex degree (hub-bounded), never by component size, and degree
   * hot-spots aggregate map-side (min is combinable).
   */
  final case class CcResult(components: DataFrame, metrics: Seq[SuperstepMetric], rounds: Int)

  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsResult(spark, edges, maxIter).components

  /** Resume a checkpointed CC run mid-convergence: continues from the latest
    * contracted edge set written to `dir` (north_rule: every kernel run is
    * resumable with per-partition lineage + metrics). */
  def resumeConnectedComponents(spark: SparkSession, edges: DataFrame, dir: String,
                                maxIter: Int = 50, checkpointEvery: Int = 5): CcResult = {
    val (round, state) = readLatestCheckpoint(spark, dir, "cc")
    connectedComponentsResult(spark, edges, maxIter, checkpointEvery, Some(dir),
      startState = Some(state), startRound = round)
  }

  def connectedComponentsResult(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
                                checkpointEvery: Int = 5, checkpointDir: Option[String] = None,
                                startState: Option[DataFrame] = None,
                                startRound: Int = 0): CcResult = {
    import spark.implicits._
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val input = edges.select($"src".cast("long"), $"dst".cast("long"))
    val vertices = input.select($"src".as("id")).union(input.select($"dst".as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)

    // large-star: every neighbor v > u links to m = min(N(u) ∪ {u});
    // keeps (u, m) links implicit via the next small-star round.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.filter($"src" =!= $"dst")
        .union(e.filter($"src" =!= $"dst").select($"dst".as("src"), $"src".as("dst")))
      val mins = sym.groupBy($"src").agg(least(min($"dst"), first($"src")).as("m"))
      // no distinct here: duplicates are collapsed by the small-star round
      // that always follows — saves a full edge-set shuffle per round
      sym.join(mins, Seq("src"))
        .filter($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst"))
    }

    // small-star: orient every edge high->low; every low neighbor (and u
    // itself) links to m = min(N(u) ∪ {u}).
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.filter($"src" =!= $"dst")
        .select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
      val withMin = dir.groupBy($"src").agg(min($"dst").as("m"))
      dir.join(withMin, Seq("src"))
        .filter($"dst" =!= $"m")
        .select($"dst".as("src"), $"m".as("dst"))
        .union(withMin.select($"src", $"m".as("dst")))
        .distinct()
    }

    var e = startState.getOrElse(input.filter($"src" =!= $"dst").distinct())
      .repartition(shufflePartitions, $"src")
      .localCheckpoint(true)
    val edgePartitions = e.rdd.getNumPartitions

    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetric]
    var iter = startRound
    var done = e.isEmpty
    while (iter < maxIter && !done) {
      val t0 = System.nanoTime()
      // Eager localCheckpoint each round: cuts logical lineage (see pageRank);
      // the convergence fingerprint below rides on the same materialization.
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      // converged when the edge set is unchanged (order-independent,
      // overflow-free digest — ANSI mode forbids wrapping sums)
      def digest(df: DataFrame) = df
        .agg(count(lit(1)), expr("coalesce(bit_xor(xxhash64(src, dst)), 0L)")).first()
      val dNext = digest(next)
      done = dNext == digest(e)
      e = next
      iter += 1
      if (iter % checkpointEvery == 0 && !done)
        checkpointDir.foreach(dir => writeCheckpoint(spark, dir, "cc", iter, e))
      metrics += SuperstepMetric("cc", iter, (System.nanoTime() - t0) / 1000000L,
        dNext.getLong(0), edgePartitions, Double.NaN)
    }

    // At the fixpoint every edge points v -> root(min id of v's component);
    // roots and isolated vertices label themselves.
    val components = vertices
      .join(e.select($"src".as("id"), $"dst".as("c")), Seq("id"), "left")
      .select($"id", coalesce($"c", $"id").as("component"))
    CcResult(components, metrics.toSeq, iter)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  // ------------------------------------------------------ label propagation

  /**
   * Synchronous label propagation (community detection): each superstep every
   * vertex adopts the most frequent label among its in-neighbors on the
   * symmetrized graph, ties broken deterministically by (count desc, label
   * asc) — SURVEY §7.4-6. Fixed iteration count => exactly reproducible.
   */
  final case class LpResult(labels: DataFrame, metrics: Seq[SuperstepMetric], supersteps: Int)

  def labelPropagation(spark: SparkSession, edges: DataFrame, iterations: Int): DataFrame =
    labelPropagationResult(spark, edges, iterations).labels

  /** Resume a checkpointed LP run mid-convergence from the latest label
    * snapshot in `dir` (north_rule: resumable, per-partition lineage + metrics). */
  def resumeLabelPropagation(spark: SparkSession, edges: DataFrame, iterations: Int, dir: String,
                             checkpointEvery: Int = 5): LpResult = {
    val (step, labels) = readLatestCheckpoint(spark, dir, "lp")
    labelPropagationResult(spark, edges, iterations, checkpointEvery, Some(dir),
      startLabels = Some(labels), startSuperstep = step)
  }

  def labelPropagationResult(spark: SparkSession, edges: DataFrame, iterations: Int,
                             checkpointEvery: Int = 5, checkpointDir: Option[String] = None,
                             startLabels: Option[DataFrame] = None,
                             startSuperstep: Int = 0): LpResult = {
    import spark.implicits._
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val sym = edges.select($"src".cast("long"), $"dst".cast("long"))
      .union(edges.select($"dst".cast("long").as("src"), $"src".cast("long").as("dst")))
      .distinct()
      .repartition(shufflePartitions, $"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = sym.count()
    val edgePartitions = sym.rdd.getNumPartitions

    val vertices = sym.select($"src".as("id")).distinct()
    var labels = startLabels.getOrElse(vertices.withColumn("label", $"id"))
      .localCheckpoint(true)

    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetric]
    var iter = startSuperstep
    while (iter < iterations) {
      val t0 = System.nanoTime()
      val msgs = labels.withColumnRenamed("id", "src")
        .join(sym, Seq("src"))
        .select($"dst".as("id"), $"label")
      val counts = msgs.groupBy($"id", $"label").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"id").orderBy($"cnt".desc, $"label".asc)
      val winners = counts.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).select($"id", $"label".as("newLabel"))
      iter += 1
      // lineage cut every superstep; materialized at checkpoint boundaries
      // (see pageRank)
      val atCheckpoint = iter % checkpointEvery == 0 || iter == iterations
      labels = labels
        .join(winners, Seq("id"), "left")
        .select($"id", coalesce($"newLabel", $"label").as("label"))
        .localCheckpoint(atCheckpoint)
      if (atCheckpoint && iter != iterations)
        checkpointDir.foreach(dir => writeCheckpoint(spark, dir, "lp", iter, labels))
      metrics += SuperstepMetric("lp", iter, (System.nanoTime() - t0) / 1000000L,
        edgeCount, edgePartitions, Double.NaN)
    }
    sym.unpersist(false)
    LpResult(labels.select($"id", $"label"), metrics.toSeq, iter)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  // ------------------------------------------------------------- triangles

  /**
   * Exact triangle counting with degree-ordered orientation: each undirected
   * edge is oriented from the endpoint with the lower (degree, id) to the
   * higher, so every wedge is enumerated exactly once from its lowest-degree
   * corner — hub vertices never explode quadratically (SURVEY §4.3-2).
   * Returns (total, perVertex(id, triangles)).
   */
  def triangleCount(spark: SparkSession, edges: DataFrame): (Long, DataFrame) = {
    import spark.implicits._
    val und = edges.select($"src".cast("long"), $"dst".cast("long"))
      .filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val deg = und.select($"u".as("id")).union(und.select($"v".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("deg"))

    // Orient by (degree, id).
    val oriented = und
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u").otherwise($"v").as("a"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v").otherwise($"u").as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Wedges from the low-(degree,id) corner, pair canonicalized by value so
    // the close is a pure equi-join against the value-canonical undirected
    // set — an OR-of-orientations predicate here would degrade to a nested-
    // loop join (O(wedges x edges)); the equi-join is O(wedges).
    val e1 = oriented.select($"a", $"b".as("x"))
    val e2 = oriented.select($"a".as("aa"), $"b".as("y"))
    val wedges = e1.join(e2, e1("a") === e2("aa") && e1("x") < e2("y"))
      .select($"a", $"x", $"y")
    val closing = und.select($"u".as("x"), $"v".as("y"))
    val triangles = wedges.join(closing, Seq("x", "y"))
      .select($"a", $"x", $"y")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val total = triangles.count()
    val perVertex = triangles.select(explode(array($"a", $"x", $"y")).as("id"))
      .groupBy($"id").agg(count(lit(1)).as("triangles"))
    und.unpersist(false); oriented.unpersist(false)
    (total, perVertex)
  }

  /** In/out degree per vertex of a directed edge table. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDegree"))
    val in = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("inDegree"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("outDegree"), lit(0L)).as("outDegree"),
        coalesce(col("inDegree"), lit(0L)).as("inDegree"))
  }
}
