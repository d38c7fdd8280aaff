package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.gen.SyntheticRepoFiles.mix

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`Array[Float]`).
 *
 *  - Baseline: brute-force cosine top-k as a broadcast-join + window rank —
 *    exact, and the correctness oracle for the approximate paths.
 *  - Scale path: random-hyperplane LSH buckets (probing the query's bucket
 *    and its 1-bit-flip neighbors) so the candidate set is a tiny fraction
 *    of the corpus; exact cosine re-rank inside candidates.
 *
 * Dot products use the built-in `zip_with`/`aggregate` higher-order
 * functions (codegen'd) — no UDF in the hot path.
 */
object Similarity {

  /** Cosine similarity as a pure Column expression over two array columns. */
  def cosineCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Scala-side cosine (for typed paths and oracles); double accumulation in
    * array order, matching cosineCol's evaluation order. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim). */
  private def planeComponent(seed: Long, plane: Int, dim: Int): Double = {
    val h = mix(seed, plane.toLong, dim.toLong)
    ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** Sign signature of a vector against `planes` seeded hyperplanes. */
  def hyperplaneSignature(v: Array[Float], planes: Int, seed: Long): Long = {
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * planeComponent(seed, p, i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /**
   * Exact brute-force top-k: queries x corpus cosine, ranked per query with
   * a deterministic tie-break on corpus id. The query side is expected to be
   * small -> broadcast, so the corpus is scanned exactly once with no shuffle
   * except the final per-query top-k aggregation.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", qVec: String = "embedding",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /**
   * LSH-bucketed ANN top-k (the scale path): corpus vectors are hashed into
   * 2^planes buckets once; each query probes its own bucket plus all
   * single-bit-flip neighbor buckets, candidates are exact-cosine re-ranked.
   * Recall < 1 by construction; verified against bruteForceTopK in tests.
   */
  def lshTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 8, seed: Long = 31L,
              qId: String = "vec_id", qVec: String = "embedding",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    import spark.implicits._
    val c = corpus.select(col(cId).cast("long").as("neighbor_id"), col(cVec).as("cv"))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, hyperplaneSignature(v.toArray, planes, seed)) }
      .toDF("neighbor_id", "cv", "bucket")

    val q = queries.select(col(qId).cast("long").as("query_id"), col(qVec).as("qv"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        val sig = hyperplaneSignature(v.toArray, planes, seed)
        (sig +: (0 until planes).map(b => sig ^ (1L << b))).distinct.map(s => (id, v, s))
      }
      .toDF("query_id", "qv", "bucket")

    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Vector L2 norms (explode-free Column path). */
  def norms(embeddings: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.select(col(idCol),
      round(sqrt(aggregate(col(vecCol), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))), 4)
        .as("norm"))
}
