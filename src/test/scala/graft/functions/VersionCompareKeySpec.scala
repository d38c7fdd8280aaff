package graft.functions

import graft.SparkTestHarness
import graft.model.VersionCompare
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class VersionCompareKeySpec extends AnyFunSuite {

  lazy val spark = SparkTestHarness.spark

  val corpus = Seq(
    "1.2.3", "v2.1", "1", "", "x.1.2", "1.x", "10.20.30", "123456.1.2",
    "1.2.3.4", "0.0.1-rc.1", "weird..", "a.b.c", "1.2.3-SNAPSHOT",
    "99999.99999.99999", "100000.1.1", "1..3", "007.08.009")

  test("expression output equals the Scala key function on a nasty corpus") {
    import spark.implicits._
    val got = corpus.toDF("v")
      .select(VersionCompareKey.of($"v").as("k")).as[String].collect().toSeq
    assert(got == corpus.map(VersionCompare.key))
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    import spark.implicits._
    // a non-local source: local relations are constant-folded before codegen
    val df = spark.range(20).selectExpr("cast(id as string) || '.2.3' as v")
      .select(VersionCompareKey.of($"v").as("k"))
    // "*(1)" prefixes mark operators inside WholeStageCodegen stage 1
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [version_compare_key"))
    assert(df.as[String].collect().toSeq ==
      (0 until 20).map(i => VersionCompare.key(s"$i.2.3")))
  }

  test("GraftExtensions registers version_compare_key as a SQL function") {
    val base = spark // force harness init first
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // withExtensions is the shared-SparkContext path; a cold spark-submit
    // reaches the same code via --conf spark.sql.extensions=graft.functions.
    // GraftExtensions (a static conf, read at context creation).
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      import s2.implicits._
      val got = s2.sql("SELECT version_compare_key(v) AS k FROM VALUES ('1.2.3'), ('x.2') AS t(v)")
        .as[String].collect().toSeq
      assert(got == Seq(VersionCompare.key("1.2.3"), VersionCompare.key("x.2")))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
