package graft.tools

import graft.gen.SyntheticRepoFiles.mix
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Label-propagation skew probe (VERDICT r2 #7 done-criterion): the same
 * hub-heavy graph shape as CcProbe — >=10M edges, 10% of them pointing at
 * vertex 0 (the junit/lodash analogue), so after symmetrization vertex 0's
 * adjacency is ~20% of all rows and would sit in ONE task of every
 * superstep's join without the hub salting in
 * GraphOps.labelPropagationResult. Prints per-stage max/median task
 * durations for the heaviest stages; "no straggler" = max/median < 4 within
 * each heavy stage. Usage: runMain graft.tools.LpProbe <cores> <edgesM> [iters]
 */
object LpProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val edges = (if (args.length > 1) args(1).toDouble else 10.0) * 1e6
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) { tasks.add((t.stageId, t.taskInfo.duration)); () }
    })

    val n = (edges / 20).toLong // avg degree 20
    val e = spark.range(edges.toLong).map { i =>
      val h = mix(23L, i)
      val src = Math.floorMod(h, n)
      val u = ((mix(h, 5L) >>> 11).toDouble / (1L << 53).toDouble)
      val dst = if (i % 10 == 0) 0L else math.min(n - 1, (u * u * n).toLong)
      (src, dst)
    }.toDF("src", "dst")

    val t0 = System.nanoTime()
    val labels = graft.graph.GraphOps.labelPropagation(spark, e, iters)
    val nLabels = labels.select($"label").distinct().count()
    val nVertices = labels.count()
    val sec = (System.nanoTime() - t0) / 1e9

    import scala.jdk.CollectionConverters._
    val byStage = tasks.asScala.toVector.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val heavy = byStage.toSeq.sortBy { case (_, ds) => -ds.sum }.take(8)
    println(f"CORES=$cores edges=${edges.toLong} vertices=$nVertices labels=$nLabels iters=$iters wall=$sec%.1fs")
    var worst = 0.0
    heavy.foreach { case (stage, ds) =>
      val med = math.max(1L, ds(ds.length / 2))
      val mx = ds.last
      val ratio = mx.toDouble / med
      if (ds.sum > 2000 && ratio > worst) worst = ratio // only stages with real work
      println(f"stage=$stage tasks=${ds.length} sumMs=${ds.sum} medianMs=$med maxMs=$mx max/median=$ratio%.2f")
    }
    println(f"worst heavy-stage max/median = $worst%.2f (target < 4)")
    spark.stop()
  }
}
