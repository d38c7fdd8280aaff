package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Plan evidence for the r6 SCC trim-round reshape: writes
 * `plans/r06/kernel_scc_trim_round_{before,after}.txt`. Each file holds the
 * `.explain("formatted")` of EVERY driver action one trim round runs, in
 * order, built from the same checkpointed leaves under the kernel conf
 * (AQE off) exactly as `GraphOps.sccResult` runs them — so the action count
 * and the per-action Exchange counts in the two files are what the kernel
 * pays per round:
 *  - before (pre-r6): 3 actions — trimmed (two endpoint distincts + double
 *    anti-join + union/distinct), the verts update, and the edge peel;
 *  - after (shipped): 2 actions — survivors (ONE map-side-combined
 *    endpoint-tag aggregation) and the edge peel (semi-joins; the src side
 *    rides e's checkpointed hash(src) layout). The trimmed part became a
 *    lazy anti-join scanned once in the final assemble.
 * Run: `sbt "runMain graft.tools.SccPlanDump [sfDir]"`.
 */
object SccPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val outDir = java.nio.file.Paths.get("plans", "r06")
    java.nio.file.Files.createDirectories(outDir)

    def explain(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    def write(name: String, sections: Seq[(String, String)]): Unit = {
      val body = sections.map { case (t, p) => s"== ACTION: $t ==\n\n$p" }.mkString("\n\n")
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), body)
      println(s"dumped $name (${sections.size} actions)")
    }

    // same leaves sccResult starts a round from: checkpointed edges at the
    // kernel width, checkpointed live-vertex table
    val raw = graft.queries.Queries.derivedEdges(spark, sfDir)
      .select($"src".cast("long"), $"dst".cast("long"))
      .filter($"src" =!= $"dst").distinct().localCheckpoint(true)
    // same derivation as GraphOps.kernelPartitions (package-private there)
    val p = math.min(cpus.toLong, math.max(8L,
      raw.count() / sys.env.getOrElse("GRAFT_EDGES_PER_PARTITION", "150000").toLong + 1L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", p)
    val e = raw.repartition(p, $"src").localCheckpoint(true)
    val verts = e.select($"src".as("id")).union(e.select($"dst".as("id")))
      .distinct().localCheckpoint(true)

    // -------- pre-r6 round: 3 actions --------
    val srcs = e.select($"src".as("id")).distinct()
    val dsts = e.select($"dst".as("id")).distinct()
    val trimmedPlan = verts.join(srcs, Seq("id"), "left_anti")
      .union(verts.join(dsts, Seq("id"), "left_anti")).distinct()
      .select($"id", $"id".as("scc"))
    val trimmed = trimmedPlan.localCheckpoint(true) // as the kernel did: materialized per round
    val vertsUpdateBefore = verts.join(trimmed, Seq("id"), "left_anti")
    val peelBefore = e.join(trimmed.select($"id".as("src")), Seq("src"), "left_anti")
      .join(trimmed.select($"id".as("dst")), Seq("dst"), "left_anti")
      .select($"src", $"dst")
      .repartition(p, $"src")
    write("kernel_scc_trim_round_before", Seq(
      "trimmed = verts minus live-src minus live-dst (materialized + counted)" -> explain(trimmedPlan),
      "verts = verts anti-join trimmed (materialized)" -> explain(vertsUpdateBefore),
      "e = peel by double anti-join (materialized)" -> explain(peelBefore)))

    // -------- shipped round: 2 actions --------
    val survPlan = e.select($"src".as("id"), lit(1).as("o"), lit(0).as("i"))
      .union(e.select($"dst".as("id"), lit(0).as("o"), lit(1).as("i")))
      .groupBy($"id").agg(max($"o").as("o"), max($"i").as("i"))
      .filter($"o" === 1 && $"i" === 1)
      .select($"id")
    val surv = survPlan.localCheckpoint(true) // the next verts table, counted
    val peelAfter = e.join(surv.select($"id".as("src")), Seq("src"), "left_semi")
      .join(surv.select($"id".as("dst")), Seq("dst"), "left_semi")
      .select($"src", $"dst")
      .repartition(p, $"src")
    write("kernel_scc_trim_round_after", Seq(
      "surv = one endpoint-tag aggregation (materialized + counted; IS the next verts)" -> explain(survPlan),
      "e = peel by semi-join on surv (materialized; trimmed part stays lazy)" -> explain(peelAfter)))

    spark.stop()
  }
}
