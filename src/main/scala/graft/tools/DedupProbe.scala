package graft.tools

import graft.gen.SyntheticRepoFiles.mix
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * MinHash verify-stage proportionality probe (VERDICT r2 #2 done-criterion):
 * a large corpus where <1% of docs are near-duplicates must show a verify
 * stage whose shuffle volume tracks the CANDIDATE count, not the corpus.
 * The probe runs minhashNearDups over N mostly-unique docs with a small
 * planted duplicate set, sums per-stage shuffle-write bytes via a listener,
 * and compares the largest observed shuffle against the size of the full
 * corpus's shingle sets (what the pre-fix code shuffled).
 * Usage: runMain graft.tools.DedupProbe <cores> <docsK> <dupPct>
 */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val docs = (if (args.length > 1) args(1).toInt else 1000) * 1000L
    val dupPerMille = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shuffleBytes = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (w > 0) { shuffleBytes.merge(s.stageInfo.stageId, w, Long.box(_) + Long.box(_)); () }
      }
    })

    // Mostly-unique ~200-char docs; every 1000/dupPerMille-th doc repeats
    // doc (i - i % 1000)'s text => planted near-dup clusters well under 1%.
    val corpus = spark.range(docs).map { boxed =>
      val i = boxed.longValue
      val base = if (i % 1000 < dupPerMille && i % 1000 > 0) i - i % 1000 else i
      val sb = new StringBuilder(220)
      var w = 0
      while (w < 25) { sb.append("w").append(mix(base, w.toLong) & 0xFFFFFF).append(' '); w += 1 }
      (i, sb.toString)
    }.toDF("doc_id", "text").persist()
    val nDocs = corpus.count()

    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.minhashNearDups(spark, corpus, "doc_id", "text", threshold = 0.7)
    val nPairs = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // Counterfactual: bytes the OLD full-corpus shingle materialization
    // shuffled = docs x (shingles/doc x 8B + row overhead). Measure the
    // real per-doc shingle count on a sample.
    val sample = corpus.limit(1000).as[(Long, String)].collect()
    val avgShingles = sample.map(d => graft.ops.Dedup.shingles(d._2).size).sum.toDouble / sample.length
    val fullCorpusShingleBytes = (nDocs * avgShingles * 8).toLong

    import scala.jdk.CollectionConverters._
    val stages = shuffleBytes.asScala.toSeq.sortBy(-_._2).take(8)
    val largest = stages.headOption.map(_._2).getOrElse(0L)
    println(f"CORES=$cores docs=$nDocs dupPerMille=$dupPerMille nearDupPairs=$nPairs wall=$sec%.1fs")
    println(f"avgShinglesPerDoc=$avgShingles%.1f fullCorpusShingleBytes=${fullCorpusShingleBytes / 1e6}%.1fMB (the pre-fix verify shuffle)")
    stages.foreach { case (id, b) => println(f"stage=$id shuffleWrite=${b / 1e6}%.2fMB") }
    println(f"largest observed shuffle = ${largest / 1e6}%.1fMB vs full-corpus-shingle counterfactual ${fullCorpusShingleBytes / 1e6}%.1fMB " +
      f"(ratio ${largest.toDouble / fullCorpusShingleBytes}%.3f; verify-stage shuffle must track candidates, not corpus)")

    // ---- exact-dedup shuffle width: sha2 group keys vs raw document bodies
    shuffleBytes.clear()
    val nKept = graft.ops.Dedup.exact(corpus, "doc_id", "text").count()
    val exactShuffle = shuffleBytes.asScala.values.sum
    // counterfactual: grouping by the raw text column shuffles every
    // document's body (plus ids); measure the actual corpus text bytes
    val textBytes = corpus.select(sum(length(col("text")))).first().getLong(0)
    println(f"exactDedup: kept=$nKept shuffleWrite=${exactShuffle / 1e6}%.1fMB vs corpus text ${textBytes / 1e6}%.1fMB " +
      f"(ratio ${exactShuffle.toDouble / textBytes}%.3f; sha2 grouping shuffles constant-width digest keys, not bodies — the gap widens with document size)")
    spark.stop()
  }
}
