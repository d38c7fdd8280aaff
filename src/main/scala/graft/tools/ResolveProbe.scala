package graft.tools

import graft.model._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Resolve-join skew probe (VERDICT r1 #10 done-criterion): a Zipf-heavy AP
 * edge corpus where ONE hub package+spec key carries 10% of all edges (the
 * junit analogue), resolved with AQE OFF so only the explicit hub-key
 * salting in ResolveJob.saltedFanout balances the fan-out join. Prints
 * per-stage max/median task durations; target < 4x within heavy stages.
 * Usage: runMain graft.tools.ResolveProbe <cores> <edgesM>
 */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val edges = ((if (args.length > 1) args(1).toDouble else 5.0) * 1e6).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "false") // salting must carry the skew alone
      .config("spark.ui.enabled", "false")
      // Shuffle/spill files on tmpfs: a real cluster gets one local SSD per
      // executor (shuffle I/O scales with N); this box has ONE shared /tmp
      // disk, which otherwise caps thread-scaling of shuffle-bound phases.
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) { tasks.add((t.stageId, t.taskInfo.duration)); () }
    })

    val nPkgs = 50000L
    // 10% of edges hit package 0 with ONE spec; the rest spread uniformly.
    val ap = spark.range(edges).map { i =>
      val pkg = if (i % 10 == 0) 0L
                else 1L + Math.floorMod(graft.gen.SyntheticRepoFiles.mix(3L, i), nPkgs - 1)
      ApEdge(s"npm:src$i:1.0.0", s"npm:pkg$pkg", "npm", ">=1.0.0", resolved = false, Map.empty)
    }
    val artifacts = spark.range(nPkgs).flatMap { p =>
      Seq("1.0.0", "1.5.0", "2.0.0").map(v =>
        ArtifactRow(s"npm:pkg$p:$v", s"npm:pkg$p", v, graft.model.VersionCompare.key(v), Map.empty))
    }

    val t0 = System.nanoTime()
    val resolved = graft.resolve.ResolveJob.run(spark, ap, artifacts)
    val nAa = resolved.aaEdges.count()
    val sec = (System.nanoTime() - t0) / 1e9

    import scala.jdk.CollectionConverters._
    val byStage = tasks.asScala.toVector.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val heavy = byStage.toSeq.sortBy { case (_, ds) => -ds.sum }.take(8)
    println(f"CORES=$cores apEdges=$edges aaEdges=$nAa wall=$sec%.1fs (AQE off)")
    var worst = 0.0
    heavy.foreach { case (stage, ds) =>
      val med = math.max(1L, ds(ds.length / 2))
      val mx = ds.last
      val ratio = mx.toDouble / med
      if (ds.sum > 2000 && ratio > worst) worst = ratio
      println(f"stage=$stage tasks=${ds.length} sumMs=${ds.sum} medianMs=$med maxMs=$mx max/median=$ratio%.2f")
    }
    println(f"worst heavy-stage max/median = $worst%.2f (target < 4)")
    spark.stop()
  }
}
