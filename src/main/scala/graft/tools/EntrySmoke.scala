package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY rows=${rows.length} in ${(System.nanoTime()-t0)/1e9}s")
    rows.take(5).foreach(r => println("  " + r))
    spark.stop()
  }
}
