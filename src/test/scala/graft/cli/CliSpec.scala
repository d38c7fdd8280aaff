package graft.cli

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end lifecycle through the CLI command surface: start -> parse ->
  * pagerank (with mid-run resume) -> update -> export -> delete. */
class CliSpec extends AnyFunSuite {

  lazy val spark = SparkTestHarness.spark
  lazy val store = java.nio.file.Files.createTempDirectory("graft-store").toString

  test("start mines and persists the store") {
    Cli.run(spark, "start", store, Array("30"))
    assert(GraphStore.readPackages(spark, store).count() > 0)
    assert(GraphStore.readArtifacts(spark, store).count() > 0)
    assert(spark.read.parquet(s"$store/pp_edges").count() > 0)
    assert(graft.Metrics.readStages(spark, store).count() == 1)
  }

  test("parse resolves AA edges and flips resolved flags") {
    Cli.run(spark, "parse", store, Array.empty)
    assert(spark.read.parquet(s"$store/aa_edges").count() > 0)
    val ap = GraphStore.readApEdges(spark, store)
    assert(ap.filter(_.resolved).count() > 0)
  }

  test("pagerank writes ranks and checkpoints; second run resumes") {
    Cli.run(spark, "pagerank", store, Array("8"))
    val ranks1 = spark.read.parquet(s"$store/pagerank").count()
    assert(ranks1 > 0)
    // checkpoints live under a (graph fingerprint, iters)-keyed directory
    val ckpts = new java.io.File(s"$store/checkpoints").listFiles
    assert(ckpts != null && ckpts.exists(d => d.getName.startsWith("pr-") && d.getName.endsWith("-i8")))
    assert(ckpts.exists(d => new java.io.File(d, "pagerank/LATEST").exists))
    // "killed and restarted": same command resumes from the checkpoint
    Cli.run(spark, "pagerank", store, Array("8"))
    assert(spark.read.parquet(s"$store/pagerank").count() == ranks1)
    assert(spark.read.parquet(s"$store/metrics/supersteps").count() > 0)
    // a different iteration target must NOT resume from the i8 checkpoints
    Cli.run(spark, "pagerank", store, Array("4"))
    assert(spark.read.parquet(s"$store/pagerank").count() == ranks1)
  }

  test("stop command writes the marker; a fresh pagerank invocation ignores the stale request") {
    Cli.run(spark, "stop", store, Array.empty)
    assert(graft.util.Fs.exists(spark, s"$store/STOP"))
    // the marker predates the pagerank invocation -> stale -> run completes;
    // the file itself is left in place (watermark semantics, not deletion)
    Cli.run(spark, "pagerank", store, Array("4"))
    assert(graft.util.Fs.exists(spark, s"$store/STOP"))
    assert(spark.read.parquet(s"$store/pagerank").count() > 0)
  }

  test("components and labelprop run resumable kernels over the linkage graph") {
    Cli.run(spark, "components", store, Array.empty)
    val comp = spark.read.parquet(s"$store/components")
    val n1 = comp.count()
    assert(n1 > 0)
    assert(comp.columns.toSet == Set("package_id", "component"))
    // second invocation resumes from the converged checkpoint, same output
    Cli.run(spark, "components", store, Array.empty)
    assert(spark.read.parquet(s"$store/components").count() == n1)
    Cli.run(spark, "labelprop", store, Array("4"))
    val labels = spark.read.parquet(s"$store/labels")
    assert(labels.count() > 0)
    assert(labels.columns.toSet == Set("package_id", "label"))
  }

  test("update merges delta artifacts and appends delta AA edges") {
    val beforeArtifacts = GraphStore.readArtifacts(spark, store).count()
    Cli.run(spark, "update", store, Array("40")) // bigger corpus -> new artifacts
    val afterArtifacts = GraphStore.readArtifacts(spark, store).count()
    assert(afterArtifacts > beforeArtifacts)
    // ids stay unique after merge
    val ids = GraphStore.readArtifacts(spark, store).select("id")
    assert(ids.distinct().count() == ids.count())
  }

  test("export writes one package id per line; import-ids pages them back") {
    val out = s"$store/ids_out"
    Cli.run(spark, "export", store, Array(out))
    val n = spark.read.text(out).count()
    assert(n == GraphStore.readPackages(spark, store).count())
    Cli.run(spark, "import-ids", store, Array(out, "5", "10"))
    assert(spark.read.parquet(s"$store/ids").count() == math.min(10, n - 5))
  }

  test("status and logs report without error on a populated store") {
    Cli.run(spark, "status", store, Array.empty)
    Cli.run(spark, "logs", store, Array.empty)
    Cli.run(spark, "logs", store, Array("0"))
  }

  test("config validates and persists reference-meaningful keys") {
    intercept[IllegalArgumentException](Cli.run(spark, "config", store, Array("dgm.linkage", "bogus")))
    intercept[IllegalArgumentException](Cli.run(spark, "config", store, Array("not.a.key", "1")))
    Cli.run(spark, "config", store, Array("dgm.parallel", "10"))
    Cli.run(spark, "config", store, Array("dgm.linkage", "aa"))
    assert(CliConfig.readAll(spark, store) == Map("dgm.parallel" -> "10", "dgm.linkage" -> "aa"))
    Cli.run(spark, "config", store, Array.empty) // get-all prints, no throw
  }

  test("delete drops the store") {
    Cli.run(spark, "delete", store, Array.empty)
    assert(!new java.io.File(store).exists)
  }

  test("start auto-chains parse when dgm.linkage=aa (MinerScheduler.java:160-162)") {
    val s2 = java.nio.file.Files.createTempDirectory("graft-store-aa").toString
    Cli.run(spark, "config", s2, Array("dgm.linkage", "aa"))
    Cli.run(spark, "start", s2, Array("20"))
    // parse ran without a separate invocation: aa_edges exist, flags flipped
    assert(spark.read.parquet(s"$s2/aa_edges").count() > 0)
    assert(GraphStore.readApEdges(spark, s2).filter(_.resolved).count() > 0)
    // per-linkage store has no pp_edges; pagerank falls back to the AA graph
    assert(!graft.util.Fs.exists(spark, s"$s2/pp_edges"))
    Cli.run(spark, "pagerank", s2, Array("4"))
    assert(spark.read.parquet(s"$s2/pagerank").count() > 0)
    Cli.run(spark, "delete", s2, Array.empty)
  }

  test("dgm.linkage=pp skips the AP edge build (per-linkage tables, Neo4jDatabaseController.java:103-131)") {
    val s5 = java.nio.file.Files.createTempDirectory("graft-store-pp").toString
    Cli.run(spark, "config", s5, Array("dgm.linkage", "pp"))
    Cli.run(spark, "start", s5, Array("20"))
    assert(!graft.util.Fs.exists(spark, s"$s5/ap_edges"), "pp mode must not materialize AP edges")
    assert(spark.read.parquet(s"$s5/pp_edges").count() > 0)
    assert(GraphStore.readPackages(spark, s5).count() > 0)
    Cli.run(spark, "delete", s5, Array.empty)
  }

  test("update works on a dgm.linkage=aa store (no pp_edges table)") {
    val s6 = java.nio.file.Files.createTempDirectory("graft-store-upd-aa").toString
    Cli.run(spark, "config", s6, Array("dgm.linkage", "aa"))
    Cli.run(spark, "start", s6, Array("20"))
    val beforeArtifacts = GraphStore.readArtifacts(spark, s6).count()
    val beforeAa = spark.read.parquet(s"$s6/aa_edges").count()
    Cli.run(spark, "update", s6, Array("30"))
    assert(GraphStore.readArtifacts(spark, s6).count() > beforeArtifacts)
    assert(spark.read.parquet(s"$s6/aa_edges").count() >= beforeAa)
    // update must not conjure the table the linkage skipped
    assert(!graft.util.Fs.exists(spark, s"$s6/pp_edges"))
    Cli.run(spark, "delete", s6, Array.empty)
  }

  test("update works on a dgm.linkage=pp store (no ap_edges/aa_edges tables); parse errors clearly") {
    val s7 = java.nio.file.Files.createTempDirectory("graft-store-upd-pp").toString
    Cli.run(spark, "config", s7, Array("dgm.linkage", "pp"))
    Cli.run(spark, "start", s7, Array("20"))
    val beforePp = spark.read.parquet(s"$s7/pp_edges").count()
    val beforeArtifacts = GraphStore.readArtifacts(spark, s7).count()
    Cli.run(spark, "update", s7, Array("30"))
    assert(GraphStore.readArtifacts(spark, s7).count() > beforeArtifacts)
    assert(spark.read.parquet(s"$s7/pp_edges").count() >= beforePp)
    assert(!graft.util.Fs.exists(spark, s"$s7/ap_edges"))
    assert(!graft.util.Fs.exists(spark, s"$s7/aa_edges"))
    val e = intercept[IllegalStateException](Cli.run(spark, "parse", s7, Array.empty))
    assert(e.getMessage.contains("ap_edges"))
    Cli.run(spark, "delete", s7, Array.empty)
  }

  test("mine-from reads external repo-file tables via every source arm") {
    import spark.implicits._
    val files = graft.gen.SyntheticRepoFiles.generate(spark, graft.gen.SyntheticRepoFiles.Config(15))
    val base = java.nio.file.Files.createTempDirectory("graft-src").toString
    files.toDF().write.mode("overwrite").parquet(s"$base/pq")
    files.toDF().write.mode("overwrite").orc(s"$base/orc")
    files.toDF().createOrReplaceTempView("repo_files_view")
    // all arms yield the identical typed dataset
    val viaPq = graft.sources.RepoFileSource.read(spark, s"parquet:$base/pq")
    val viaOrc = graft.sources.RepoFileSource.read(spark, s"orc:$base/orc")
    val viaTable = graft.sources.RepoFileSource.read(spark, "table:repo_files_view")
    val key = (d: org.apache.spark.sql.Dataset[graft.model.RepoFile]) =>
      d.collect().map(f => (f.repo, f.path, f.commit)).toSet
    assert(key(viaPq) == key(viaOrc) && key(viaPq) == key(viaTable))
    // end-to-end: mine from the external table into a store
    val s4 = java.nio.file.Files.createTempDirectory("graft-store-ext").toString
    Cli.run(spark, "mine-from", s4, Array(s"parquet:$base/pq"))
    assert(GraphStore.readPackages(spark, s4).count() > 0)
    Cli.run(spark, "delete", s4, Array.empty)
  }

  test("store maintenance is FS-portable (file: URI store path)") {
    val local = java.nio.file.Files.createTempDirectory("graft-store-uri").toString
    val s3 = "file://" + local
    Cli.run(spark, "start", s3, Array("20"))
    Cli.run(spark, "parse", s3, Array.empty)   // exercises Fs.swap on a file: URI
    assert(spark.read.parquet(s"$s3/aa_edges").count() > 0)
    Cli.run(spark, "update", s3, Array("25"))  // exercises Fs.exists + 5 swaps
    assert(GraphStore.readApEdges(spark, s3).count() > 0)
    Cli.run(spark, "delete", s3, Array.empty)
    assert(!new java.io.File(local).exists)
  }
}
