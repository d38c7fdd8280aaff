package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-6 optimization probe: phase-level wall times + per-JOB durations for
 * the bench-critical operators, so the fixed-overhead vs real-compute split
 * is measurable (guide §1: measure first; §7.1 empirical loop without the UI,
 * which is disabled on this box).
 * Usage: sbt "runMain graft.tools.R6Probe <mode> [sfDir] [reps]"
 *   modes: pr_mined | pr_derived | lp | cc | q35 | setup | all
 */
object R6Probe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
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

    // per-job wall durations with the thread-local job description
    final case class JobRec(id: Int, ms: Long, desc: String)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties).map(_.getProperty("spark.job.description")).map(String.valueOf).getOrElse("")
        starts.put(j.jobId, (j.time, d)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
          jobs.add(JobRec(j.jobId, j.time - t0, d)); ()
        }
      }
    })

    def phase[A](name: String)(f: => A): A = {
      jobs.clear()
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toVector.sortBy(_.id)
      println(f"PHASE $name%-28s wall=$sec%7.3fs jobs=${js.size}%3d jobMsSum=${js.map(_.ms).sum}%6d " +
        js.map(j => s"${j.id}:${j.ms}").mkString("[", ",", "]"))
      r
    }

    // warmup, mirroring Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def prMined(): Unit = {
      val (e, dict) = phase("setup:indexedPpEdges") {
        graft.queries.Queries.indexedPpEdges(spark, sfDir)
      }
      phase("warm:edgeCount") { e.count() }
      for (r <- 1 to reps) {
        val pr = phase(s"pr_mined:run$r") {
          val p = graft.graph.GraphOps.pageRank(spark, e, iterations = 10)
          p.ranks.count(); p
        }
        println(s"  pr_mined run$r loopMs=${pr.metrics.map(_.millis).mkString(",")} sum=${pr.metrics.map(_.millis).sum}")
        phase(s"pr_mined:topk$r") {
          pr.ranks.join(dict, Seq("id"))
            .select(col("vid").as("package_id"), round(col("rank"), 6).as("rank"))
            .orderBy(col("rank").desc, col("package_id").asc).limit(20).count()
        }
      }
    }

    def prDerived(): Unit = {
      val e = phase("setup:derivedEdges") {
        val d = graft.queries.Queries.derivedEdges(spark, sfDir); d.count(); d
      }
      for (r <- 1 to reps) {
        val pr = phase(s"pr_derived:run$r") {
          val p = graft.graph.GraphOps.pageRank(spark, e, iterations = 8, redistributeDangling = false)
          p.ranks.count(); p
        }
        println(s"  pr_derived run$r loopMs=${pr.metrics.map(_.millis).mkString(",")} sum=${pr.metrics.map(_.millis).sum}")
      }
    }

    def lp(): Unit = {
      val e = graft.queries.Queries.derivedEdges(spark, sfDir); e.count()
      for (r <- 1 to reps) {
        val res = phase(s"lp:run$r") {
          val l = graft.graph.GraphOps.labelPropagationResult(spark, e, iterations = 3)
          l.labels.count(); l
        }
        println(s"  lp run$r stepMs=${res.metrics.map(_.millis).mkString(",")}")
      }
    }

    def cc(): Unit = {
      val e = graft.queries.Queries.derivedEdges(spark, sfDir); e.count()
      for (r <- 1 to reps) {
        val res = phase(s"cc:run$r") {
          val c = graft.graph.GraphOps.connectedComponentsResult(spark, e)
          c.components.count(); c
        }
        println(s"  cc run$r rounds=${res.rounds} roundMs=${res.metrics.map(_.millis).mkString(",")} " +
          s"edges=${res.metrics.map(_.edgesScanned).mkString(",")}")
      }
    }

    def q35(): Unit = {
      val m = phase("setup:mined") { graft.queries.Queries.mined(spark, sfDir) }
      for (r <- 1 to reps) {
        phase(s"q35:run$r") {
          graft.resolve.ResolveJob.run(spark, m.apEdges, m.artifacts).aaEdges.toDF().count()
        }
      }
    }

    def setup(): Unit = {
      val cfg = graft.gen.SyntheticRepoFiles.configForSf(graft.gen.SyntheticRepoFiles.sfOfDir(sfDir))
      val gen = phase("gen:generate+count") {
        val g = graft.gen.SyntheticRepoFiles.generate(spark, cfg); g.cache().count(); g
      }
      val m = phase("mine:run (lazy)") { graft.mine.MineJob.run(spark, gen) }
      phase("mine:packages.count") { m.packages.persist().count() }
      phase("mine:artifacts.count") { m.artifacts.persist().count() }
      phase("mine:apEdges.count") { m.apEdges.persist().count() }
      phase("mine:ppEdges.count") { m.ppEdges.persist().count() }
      phase("mine:quarantine.count") { m.quarantine.persist().count() }
      phase("index:indexEdges") {
        val (e, dict) = graft.graph.GraphOps.indexEdges(spark, m.ppEdges.toDF(), "srcPackageId", "dstPackageId")
        e.persist().count(); dict.persist().count()
      }
    }

    mode match {
      case "pr_mined" => prMined()
      case "pr_derived" => prDerived()
      case "lp" => lp()
      case "cc" => cc()
      case "q35" => q35()
      case "setup" => setup()
      case _ => setup(); prMined(); prDerived(); lp(); cc(); q35()
    }
    spark.stop()
  }
}
