package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs the headline queries on
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line:
 * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":"..."}.
 * Extra keys report the north-rule throughput metrics (PageRank
 * supersteps/min, edges-scanned/sec) for the mined dependency graph.
 *
 * Failures are loud: every query reports its row count, a crashing query
 * gets an "err" entry instead of a fake wall-time, and the process exits
 * nonzero — a regression can never masquerade as a fast success.
 *
 * Host-noise protocol (r4+): the suite runs SPARK_GRAFT_BENCH_REPEATS times
 * (default 3, r5+) and "queries"/"value" report per-query minima — the least-
 * contended samples on this shared box; "queries_first" keeps pass-1 times
 * for r01-r03 artifact continuity, and "setup_sec" carries the one-time
 * mined-table/indexed-graph cache build separately.
 */
object Bench {

  /** Headline subset: mining pipeline + graph kernels + representative
    * relational/text/ANN queries. */
  val headline: Seq[String] = Seq(
    "q01_agg", "q03_join_agg", "q06_distinct_pairs", "q07_topk",
    "q09_event_compaction", "q13_degrees", "q14_pagerank",
    "q15_connected_components", "q16_triangle_count", "q18_label_propagation",
    "q19_dedup_exact", "q21_quality", "q22_lang_id", "q24_ann_brute",
    "q30_mine_packages", "q32_mine_ap_edges", "q35_resolve_aa", "q36_mined_pagerank")

  private final case class QResult(name: String, sec: Double, rows: Long, err: Option[String])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Shuffle/spill files on tmpfs: a real cluster gets one local SSD per
      // executor (shuffle I/O scales with N); this box has ONE shared /tmp
      // disk, which otherwise caps thread-scaling of shuffle-bound phases.
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Untimed warmup: JIT + codegen + parquet footer/page cache are
    // once-per-JVM costs, not per-query costs — without this the first
    // timed query absorbs them all.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    // TIMED setup: materialize the session-shared caches (mined tables,
    // indexed PP graph) once, as their own line item. These are shared by
    // q30-q37 + the north-rule section, so building them here (a) keeps
    // their one-time cost visible in `total` and (b) makes per-query
    // repeats below measure query work, not first-touch cache builds.
    // Failure contract: a mined-pipeline regression must NOT abort the whole
    // bench without a JSON artifact — setup failure is recorded, the mined
    // queries then err individually inside their own try/catch, and every
    // other query still reports a time.
    val tSetup = System.nanoTime()
    val setupResult: Either[String, (org.apache.spark.sql.DataFrame, Long)] =
      try {
        val m = queries.Queries.mined(spark, sfDir)
        m.packages.count(); m.artifacts.count(); m.apEdges.count()
        m.ppEdges.count(); m.quarantine.count()
        val (e, _) = queries.Queries.indexedPpEdges(spark, sfDir)
        Right((e, e.count()))
      } catch {
        case ex: Throwable =>
          Left(s"${ex.getClass.getSimpleName}: ${Option(ex.getMessage).getOrElse("").take(120)}")
      }
    val setupSec = (System.nanoTime() - tSetup) / 1e9

    // This box is SHARED and noisy (same job observed 34-81s minutes apart,
    // BENCH/BASELINE.md): one sample per query is meaningless round-over-
    // round. Run the whole suite SPARK_GRAFT_BENCH_REPEATS times (default 3, r5+)
    // and report the per-query MINIMUM — the best pass is the least-
    // contended estimate of what the code actually costs. Pass-1 times ride
    // along under "queries_first" for continuity with r01-r03 artifacts.
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt)
    val qs = SparkEntry.queries
    val names = headline.filter(qs.contains)
    val passes: Seq[Seq[QResult]] = (1 to repeats).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        try {
          val n = qs(name)(spark, sfDir).count()
          QResult(name, (System.nanoTime() - t0) / 1e9, n, None)
        } catch {
          case e: Throwable =>
            QResult(name, (System.nanoTime() - t0) / 1e9, -1L,
              Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"))
        }
      }
    }
    val first = passes.head
    // per-query min over passes; a query that failed in ANY pass keeps the error
    val results = names.zipWithIndex.map { case (name, i) =>
      val samples = passes.map(_(i))
      samples.find(_.err.isDefined).getOrElse(samples.minBy(_.sec))
    }

    // North-rule metrics: supersteps/min + edges-scanned/sec on the *mined*
    // dependency edge table (PP graph of the synthetic repo corpus; shares
    // the per-session indexed-graph cache with q36/q37). Same repeat-and-
    // take-best protocol; `total` charges the best pass once. Skipped (zeros
    // + an error entry) when setup failed — there is no graph to measure.
    val iters = 10
    val edgeCount = setupResult.map(_._2).getOrElse(0L)
    val (prSec, loopSec) = setupResult match {
      case Left(_) => (0.0, Double.PositiveInfinity) // throughputs render as 0, JSON stays valid
      case Right((e, _)) =>
        val prRuns = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          val pr = graft.graph.GraphOps.pageRank(spark, e, iterations = iters)
          pr.ranks.count()
          ((System.nanoTime() - t0) / 1e9, math.max(pr.metrics.map(_.millis).sum / 1e3, 1e-9))
        }
        // loop-only throughput (same convention as graft.Scaling): the
        // dictionary/adjacency build is a one-time cost, not per-superstep work
        (prRuns.map(_._1).min, prRuns.map(_._2).min)
    }
    val superstepsPerMin = iters / loopSec * 60.0
    val edgesPerSec = edgeCount.toDouble * iters / loopSec

    // Driver contract: "queries" maps name -> seconds. Row counts and errors
    // ride in sibling keys so a failed query is visible in the artifact.
    // Throughput keys: the unsuffixed pair is LOOP-ONLY time (per-superstep
    // work, the north-rule quantity); the *_incl_build pair includes the
    // one-time dictionary/adjacency build, for artifact-history continuity
    // (BENCH_r01 used build-inclusive semantics for the unsuffixed keys).
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qJson = results.map(r => s""""${r.name}":${r.sec formatted "%.3f"}""").mkString("{", ",", "}")
    val qFirstJson = first.map(r => s""""${r.name}":${r.sec formatted "%.3f"}""").mkString("{", ",", "}")
    val rowsJson = results.map(r => s""""${r.name}":${r.rows}""").mkString("{", ",", "}")
    val failed = results.filter(_.err.isDefined)
    val errEntries = failed.map(r => s""""${r.name}":"${esc(r.err.get)}"""") ++
      setupResult.left.toSeq.map(msg => s""""setup":"${esc(msg)}"""")
    val errJson = errEntries.mkString("{", ",", "}")
    val total = setupSec + results.map(_.sec).sum + prSec
    val line =
      s"""{"metric":"total","value":${total formatted "%.3f"},"unit":"sec","protocol":"min_of_n_interleaved_r4","queries":$qJson,"queries_first":$qFirstJson,"repeats":$repeats,"setup_sec":${setupSec formatted "%.3f"},"rows":$rowsJson,"errors":$errJson,"failed":${failed.size + setupResult.left.toSeq.size},"sf":"$sfDir","pagerank_supersteps_per_min":${superstepsPerMin formatted "%.2f"},"edges_scanned_per_sec":${edgesPerSec formatted "%.0f"},"pagerank_supersteps_per_min_incl_build":${(if (prSec > 0) iters / prSec * 60.0 else 0.0) formatted "%.2f"},"edges_scanned_per_sec_incl_build":${(if (prSec > 0) edgeCount.toDouble * iters / prSec else 0.0) formatted "%.0f"},"mined_pp_edges":$edgeCount}"""
    println(line)
    // Defensive artifact: the driver parses this line out of the sbt tail;
    // a copy on disk survives any log-interleaving parse failure.
    try {
      val out = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(out)
      java.nio.file.Files.writeString(out.resolve("last.json"), line + "\n")
    } catch { case e: Exception => Console.err.println(s"bench: could not write BENCH/last.json: $e") }
    spark.stop()
    if (failed.nonEmpty || setupResult.isLeft) {
      Console.err.println(s"bench: ${failed.size + setupResult.left.toSeq.size} failed: " +
        (failed.map(_.name) ++ setupResult.left.toSeq.map(_ => "setup")).mkString(", "))
      sys.exit(1)
    }
  }
}
