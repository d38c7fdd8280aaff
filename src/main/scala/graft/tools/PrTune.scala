package graft.tools

import graft.gen.SyntheticRepoFiles.mix
import org.apache.spark.sql.SparkSession

/** PageRank kernel tuning probe: big synthetic edge table, per-superstep
  * timings, AQE on/off. Usage: runMain graft.tools.PrTune <cores> <edgesM> <aqe> <dangling> */
object PrTune {

  def runAt(cores: String, edges: Double, aqe: String, dangling: Boolean,
            checkpointEvery: Int = sys.env.getOrElse("PR_CKPT_EVERY", "5").toInt): Double = {
    val mult = sys.env.getOrElse("PR_PARTS_MULT", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores.toInt * mult).toString)
      .config("spark.eventLog.enabled", sys.env.getOrElse("PR_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "file:///tmp/sparklogs")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      // Shuffle/spill files on tmpfs: a real cluster gets one local SSD per
      // executor (shuffle I/O scales with N); this box has ONE shared /tmp
      // disk, which otherwise caps thread-scaling of shuffle-bound phases.
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val n = (edges / 20).toLong // avg degree 20
      val e = spark.range(edges.toLong).map { i =>
        val h = mix(7L, i)
        val src = Math.floorMod(h, n)
        val u = ((mix(h, 3L) >>> 11).toDouble / (1L << 53).toDouble)
        val dst = math.min(n - 1, (u * u * n).toLong)
        (src, dst)
      }.toDF("src", "dst")
      val t0 = System.nanoTime()
      val r = graft.graph.GraphOps.pageRank(spark, e, iterations = 6, redistributeDangling = dangling,
        checkpointEvery = checkpointEvery)
      r.ranks.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"CORES=$cores AQE=$aqe edges=${edges.toLong} total=${sec}s " +
        s"perStep=${r.metrics.map(_.millis).mkString(",")}ms")
      sec
    } finally spark.stop()
  }

  /** cores may be a comma list ("4,16"): levels run back-to-back (paired) in
    * one JVM, repeated, and the best paired efficiency is reported — outside
    * host load makes unpaired comparisons on this box meaningless. */
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8").split(",")
    val edges = (if (args.length > 1) args(1).toDouble else 10.0) * 1e6
    val aqe = if (args.length > 2) args(2) else "true"
    val dangling = if (args.length > 3) args(3).toBoolean else true
    val repeats = if (args.length > 4) args(4).toInt else 1
    if (cores.length == 1) { runAt(cores.head, edges, aqe, dangling); () }
    else {
      val pairs = (0 until repeats).map { _ => cores.map(c => runAt(c, edges, aqe, dangling)) }
      val best = pairs.maxBy(p => p.head / p.last)
      val ratio = cores.last.toDouble / cores.head.toDouble
      println(f"PAIRED lo=${best.head}%.1fs hi=${best.last}%.1fs " +
        f"speedup=${best.head / best.last}%.2fx eff=${best.head / best.last / ratio}%.2f")
    }
  }
}
