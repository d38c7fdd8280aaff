package graft.functions

import graft.SparkTestHarness
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestHarness.spark

  def vec(seed: Int): Seq[Float] =
    (0 until 16).map(i => (graft.gen.SyntheticRepoFiles.mix(seed.toLong, i.toLong) % 1000).toFloat / 1000f)

  test("expression output is bit-equal to the Scala cosine on random vectors") {
    import spark.implicits._
    val pairs = (0 until 25).map(i => (vec(i), vec(i + 50)))
    val got = pairs.toDF("a", "b")
      .select(CosineSimilarity.of($"a", $"b").as("c")).as[Double].collect().toSeq
    val expected = pairs.map { case (a, b) => Similarity.cosine(a.toArray, b.toArray) }
    assert(got == expected, "native codegen'd kernel must match the typed Scala path exactly")
    // identical vectors: bit-equal to the Scala path (which itself lands a
    // ulp above 1.0 — sqrt(x)*sqrt(x) != x in floating point)
    val self = Seq((vec(3), vec(3))).toDF("a", "b")
      .select(CosineSimilarity.of($"a", $"b")).as[Double].head()
    assert(self == Similarity.cosine(vec(3).toArray, vec(3).toArray))
  }

  test("zero-norm vectors yield 0.0 (never NaN) in both kernels; unequal lengths error") {
    import spark.implicits._
    val zero = Seq.fill(16)(0f)
    // NaN would sort ABOVE every real similarity in Spark's ordering and
    // put a zero vector at rank 1 of every ANN top-k
    assert(Similarity.cosine(zero.toArray, vec(1).toArray) == 0.0)
    assert(Similarity.cosine(zero.toArray, zero.toArray) == 0.0)
    val viaExpr = Seq((zero, vec(1)), (zero, zero)).toDF("a", "b")
      .select(CosineSimilarity.of($"a", $"b")).as[Double].collect().toSeq
    assert(viaExpr == Seq(0.0, 0.0))
    // a zero-vector corpus member never outranks a genuinely similar
    // neighbor (NaN would have sorted above the ~1.0 cosine of the copy)
    val corpus = Seq((0L, vec(10)), (1L, vec(10)), (2L, zero)).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 0L), corpus, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(top.find(_._1 == 1).exists(_._2 == 1L), s"zero vector ranked first: ${top.mkString(",")}")
    val err = intercept[Exception] {
      Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
        .select(CosineSimilarity.of($"a", $"b")).collect()
    }
    assert(err.getMessage != null)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    import spark.implicits._
    val df = spark.range(10)
      .selectExpr("cast(array(cast(id as float), 1.0F) as array<float>) as a",
        "cast(array(1.0F, cast(id as float)) as array<float>) as b")
      .select(CosineSimilarity.of($"a", $"b").as("c"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [cosine_similarity"))
    val got = df.as[Double].collect().toSeq
    val expected = (0 until 10).map(i =>
      Similarity.cosine(Array(i.toFloat, 1f), Array(1f, i.toFloat)))
    assert(got == expected)
  }

  test("GraftExtensions registers cosine_similarity as a SQL function") {
    val base = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      import s2.implicits._
      val got = s2.sql(
        "SELECT cosine_similarity(cast(array(1.0F, 0.0F) as array<float>), cast(array(1.0F, 0.0F) as array<float>)) AS c")
        .as[Double].head()
      assert(got == 1.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
