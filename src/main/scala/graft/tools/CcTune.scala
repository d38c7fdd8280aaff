package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off CC timing harness: runs q15's graph at sf0.1 with the current
  * kernel and prints wall + rounds. Usage: runMain graft.tools.CcTune [sfDir] */
object CcTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.queries.Queries.derivedEdges(spark, sfDir)
    e.count() // warm
    sys.env.get("CC_TUNE_PARTITIONS").foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    for (rep <- 1 to 4) {
      val t0 = System.nanoTime()
      val r = graft.graph.GraphOps.connectedComponentsResult(spark, e)
      val n = r.components.count()
      println(f"rep=$rep rounds=${r.rounds} vertices=$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs " +
        s"perBlockMs=${r.metrics.map(_.millis).mkString(",")} edges=${r.metrics.map(_.edgesScanned).mkString(",")}")
    }
    spark.stop()
  }
}
