package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-6 plan snapshots: writes `.explain("formatted")` for every headline
 * query (and a representative single superstep of each iterative kernel,
 * where the interesting plan lives inside the loop) to
 * `plans/r06/<name>_<tag>.txt`. Usage:
 *   sbt "runMain graft.tools.R6PlanDump <before|after> [sfDir]"
 * The session mirrors Bench.scala's configuration so the dumped plans are
 * the plans the bench actually runs.
 */
object R6PlanDump {

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", "r06")
    java.nio.file.Files.createDirectories(outDir)

    def dump(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      try {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
        println(s"dumped $name")
      } catch { case e: Exception => println(s"FAILED $name: $e") }
    }

    val qs = graft.queries.Queries.queries
    val names = Seq("q01_agg", "q03_join_agg", "q06_distinct_pairs", "q07_topk",
      "q09_event_compaction", "q13_degrees", "q16_triangle_count",
      "q17_triangles_per_vertex", "q19_dedup_exact", "q21_quality", "q22_lang_id",
      "q24_ann_brute", "q30_mine_packages", "q32_mine_ap_edges", "q35_resolve_aa",
      "q36_mined_pagerank", "q14_pagerank", "q15_connected_components",
      "q18_label_propagation")
    // q16 executes the triangle count eagerly; dump the underlying per-vertex
    // plan instead (same close, lazy)
    names.foreach {
      case "q16_triangle_count" =>
        dump("q16_triangle_count") {
          graft.graph.GraphOps.trianglesPerVertex(spark,
            graft.queries.Queries.derivedEdges(spark, sfDir))
        }
      case n => dump(n)(qs(n)(spark, sfDir))
    }

    // Single-superstep kernel plans under the kernel conf (AQE off): this is
    // where the per-iteration Exchange count and join strategy live.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import spark.implicits._
    val e = graft.queries.Queries.derivedEdges(spark, sfDir)

    dump("kernel_pagerank_superstep") {
      val Sent = Long.MinValue
      val eW = Seq((0L, 1L, 1.0), (1L, 2L, 0.5), (1L, 0L, 0.5),
          (2L, Sent, 1.0 / 3), (Sent, Sent, 0.85 / 3), (Sent, 0L, 0.85))
        .toDF("src", "dst", "w").withColumn("salt", lit(0))
        .repartition(4, $"src").sortWithinPartitions($"src").persist()
      eW.count()
      val allIds = Seq(0L, 1L, 2L, Sent).toDF("id")
        .repartition(4, $"id").sortWithinPartitions($"id").persist()
      allIds.count()
      val state = allIds.withColumn("x",
        when($"id" === Sent, lit(0.0)).otherwise(lit(1.0 / 3))).localCheckpoint(true)
      val agg = state.withColumnRenamed("id", "src").join(eW, Seq("src"))
        .select($"dst".as("id"), ($"x" * $"w").as("c"))
        .groupBy($"id").agg(sum($"c").as("c"))
      allIds.join(agg, Seq("id"), "left")
        .select($"id", when($"id" === Sent, coalesce($"c", lit(0.0)))
          .otherwise(lit(0.05) + lit(0.85) * coalesce($"c", lit(0.0))).as("x"))
    }

    dump("kernel_lp_superstep") {
      val sym = e.select($"src", $"dst")
        .union(e.select($"dst".as("src"), $"src".as("dst")))
        .distinct().withColumn("salt", lit(0))
        .repartition(8, $"src").sortWithinPartitions($"src").persist()
      sym.count()
      val labels = sym.select($"src".as("id")).distinct()
        .withColumn("label", $"id").localCheckpoint(true)
      val msgs = labels.withColumnRenamed("id", "src")
        .join(sym, Seq("src"))
        .select($"dst".as("id"), $"label")
      val counts = msgs.groupBy($"id", $"label").agg(count(lit(1)).as("cnt"))
      val winners = counts.groupBy($"id")
        .agg(max(struct($"cnt", (-$"label").as("nl"))).as("m"))
        .select($"id", (-$"m.nl").as("newLabel"))
      labels.join(winners, Seq("id"), "left")
        .select($"id", coalesce($"newLabel", $"label").as("label"))
    }

    dump("kernel_cc_round") {
      val e0 = e.filter($"src" =!= $"dst").distinct()
        .repartition(32, $"src").localCheckpoint(true)
      val sym = e0.filter($"src" =!= $"dst")
        .union(e0.filter($"src" =!= $"dst").select($"dst".as("src"), $"src".as("dst")))
      val minsDeg = sym.groupBy($"src")
        .agg(least(min($"dst"), first($"src")).as("m"), count(lit(1)).as("deg"))
      val large = sym.join(minsDeg.select($"src", $"m"), Seq("src"))
        .filter($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst"))
      val dir = large.filter($"src" =!= $"dst")
        .select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
      val withMin = dir.groupBy($"src").agg(min($"dst").as("m"))
      dir.join(withMin, Seq("src"))
        .filter($"dst" =!= $"m")
        .select($"dst".as("src"), $"m".as("dst"))
        .union(withMin.select($"src", $"m".as("dst")))
        .distinct()
    }

    spark.stop()
  }
}
