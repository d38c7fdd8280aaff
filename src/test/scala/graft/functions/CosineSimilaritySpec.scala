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
