package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * SCC kernel phase evidence: wall time + per-phase iteration counts on the
 * derived mined-shape graph (the q73 face), so the trim-to-fixpoint claim
 * ("the overwhelming majority of vertices leave through trim before any
 * coloring round runs") is a measured artifact, not an assertion.
 * Run: `sbt "runMain graft.tools.SccProbe [sfDir]"`.
 */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.queries.Queries.derivedEdges(spark, sfDir)
    // Load-independent structural counters (this box is shared and noisy;
    // wall time alone cannot attribute a 10-20% delta): jobs = driver
    // actions, stages ≈ exchanges + result stages, shuffle bytes = data
    // actually moved. Identical input -> deterministic counts.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    val t0 = System.nanoTime()
    val (scc, stats) = graft.graph.GraphOps.sccResult(spark, edges)
    val n = scc.count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain before reading counters
    println(f"sccProbe: $n vertices in $sec%.1f s — outer=${stats.outerRounds} " +
      f"trimRounds=${stats.trimRounds} colorIters=${stats.colorIters} " +
      f"backIters=${stats.backIters} trimmed=${stats.trimmedVerts} colored=${stats.coloredVerts} " +
      f"jobs=${jobs.get} stages=${stages.get} shuffleMB=${shuffleBytes.get / 1e6}%.1f")
    spark.stop()
  }
}
