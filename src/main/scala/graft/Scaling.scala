package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-parallelism-level scaling harness (BASELINE.json north_rule: the
 * N -> 4N executor criterion, evidenced in this sandbox by running the same
 * job at local[8] and local[32] over the same input). Writes
 * BENCH/BASELINE.md with throughput at both sizes + scaling efficiency.
 *
 * The measured job is the flagship pipeline: mine the synthetic repo-file
 * table -> resolve AP->AA -> PageRank(10) over the PP package graph.
 */
object Scaling {

  final case class RunStats(cores: Int, mineSec: Double, resolveSec: Double,
                            prSec: Double, edges: Long, aaEdges: Long,
                            superstepsPerMin: Double, edgesPerSec: Double) {
    def totalSec: Double = mineSec + resolveSec + prSec
  }

  def runAt(cores: Int, sfDir: String): RunStats = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val cfg = graft.gen.SyntheticRepoFiles.configForSf(graft.gen.SyntheticRepoFiles.sfOfDir(sfDir))

      val t0 = System.nanoTime()
      val mined = graft.mine.MineJob.run(spark, graft.gen.SyntheticRepoFiles.generate(spark, cfg))
      val artifacts = mined.artifacts.persist()
      val ap = mined.apEdges.persist()
      val pp = mined.ppEdges.persist()
      val nArtifacts = artifacts.count(); val nAp = ap.count(); val nPp = pp.count()
      val mineSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val resolved = graft.resolve.ResolveJob.run(spark, ap, artifacts)
      val nAa = resolved.aaEdges.count()
      val resolveSec = (System.nanoTime() - t1) / 1e9

      val t2 = System.nanoTime()
      val (e, _) = graft.graph.GraphOps.indexEdges(spark, pp.toDF(), "srcPackageId", "dstPackageId")
      e.persist(); val edgeCount = e.count()
      val iters = 10
      val pr = graft.graph.GraphOps.pageRank(spark, e, iterations = iters)
      pr.ranks.count()
      val prSec = (System.nanoTime() - t2) / 1e9

      RunStats(cores, mineSec, resolveSec, prSec, edgeCount, nAa,
        iters / prSec * 60.0, edgeCount.toDouble * iters / prSec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lo = runAt(8, sfDir)
    val hi = runAt(32, sfDir)
    // Scaling efficiency: speedup achieved / speedup available (4x cores).
    val eff = (lo.totalSec / hi.totalSec) / 4.0
    val effPr = (lo.prSec / hi.prSec) / 4.0

    val md =
      s"""# BENCH / BASELINE — measured numbers (graft engine)
         |
         |Flagship pipeline (mine synthetic repo-file table -> AP->AA resolve ->
         |PageRank(10) over the mined PP package graph), same input at two local
         |parallelism levels — the sandbox stand-in for N vs 4N executors
         |(BASELINE.json north_rule).
         |
         |Input: $sfDir scale (generator config `configForSf`), ${lo.edges} PP edges,
         |${lo.aaEdges} AA edges resolved.
         |
         || cores | mine (s) | resolve (s) | pagerank(10) (s) | total (s) | supersteps/min | edges-scanned/sec |
         ||---|---|---|---|---|---|---|
         || 8  | ${f"${lo.mineSec}%.2f"} | ${f"${lo.resolveSec}%.2f"} | ${f"${lo.prSec}%.2f"} | ${f"${lo.totalSec}%.2f"} | ${f"${lo.superstepsPerMin}%.1f"} | ${f"${lo.edgesPerSec}%.0f"} |
         || 32 | ${f"${hi.mineSec}%.2f"} | ${f"${hi.resolveSec}%.2f"} | ${f"${hi.prSec}%.2f"} | ${f"${hi.totalSec}%.2f"} | ${f"${hi.superstepsPerMin}%.1f"} | ${f"${hi.edgesPerSec}%.0f"} |
         |
         |**Scaling efficiency (8 -> 32 cores, 4x):** total ${f"$eff%.2f"}, PageRank phase ${f"$effPr%.2f"}
         |(target >= 0.8 per BASELINE.json; local-mode cores share one JVM/memory bus, so
         |this understates true multi-executor scaling where memory bandwidth scales with N).
         |
         |Reproduce: `SPARK_GRAFT_SF_DIR=$sfDir sbt -batch "runMain graft.Scaling"`.
         |""".stripMargin
    val dir = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("BASELINE.md"), md)
    println(md)
  }
}
