package graft.tools

import graft.gen.SyntheticRepoFiles.mix
import org.apache.spark.sql.SparkSession

/** PageRank kernel tuning probe: big synthetic edge table, per-superstep
  * timings, AQE on/off. Usage: runMain graft.tools.PrTune <cores> <edgesM> <aqe> */
object PrTune {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8")
    val edges = (if (args.length > 1) args(1).toDouble else 10.0) * 1e6
    val aqe = if (args.length > 2) args(2) else "true"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      // Shuffle/spill files on tmpfs: a real cluster gets one local SSD per
      // executor (shuffle I/O scales with N); this box has ONE shared /tmp
      // disk, which otherwise caps thread-scaling of shuffle-bound phases.
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
    val r = graft.graph.GraphOps.pageRank(spark, e, iterations = 6)
    r.ranks.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"CORES=$cores AQE=$aqe edges=${edges.toLong} total=${sec}s " +
      s"perStep=${r.metrics.map(_.millis).mkString(",")}ms")
    spark.stop()
  }
}
