package graft.sources

import graft.model.RepoFile
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Input-source layer for the repo-file table (BASELINE.json input_hint:
 * `(repo, path, commit, lang, content)`; the production deployment is an
 * Iceberg table at 10^12-file scale).
 *
 * `spec` selects the source:
 *  - `table:<catalog.db.table>` — a catalog table read (`spark.read.table`).
 *    With the Iceberg runtime on the classpath this IS the Iceberg-native
 *    path: DataSourceV2 gives snapshot isolation, partition pruning and
 *    column-pruned/filter-pushed scans with no engine-side changes. (The
 *    sandbox ships no Iceberg jars, so this arm is exercised against a
 *    temp-view-backed table in tests.)
 *  - `parquet:<path>` / `orc:<path>` — direct file scans (both tested).
 *  - `avro:<path>` — direct scan via the spark-avro connector, which (like
 *    the Iceberg runtime) is not shipped in this sandbox: the arm fails
 *    with "Failed to find data source: avro" until that jar is deployed.
 *  - bare `<path>` — parquet (the sandbox default).
 *
 * Columns beyond the contract are pruned here so downstream plans always
 * see the same shape, and the select keeps scans column-pruned at the
 * source regardless of how wide the physical table is.
 */
object RepoFileSource {

  val Columns: Seq[String] = Seq("repo", "path", "commit", "lang", "content")

  def read(spark: SparkSession, spec: String): Dataset[RepoFile] = {
    import spark.implicits._
    val df = spec.split(":", 2) match {
      case Array("table", name)   => spark.read.table(name)
      case Array("parquet", path) => spark.read.parquet(path)
      case Array("orc", path)     => spark.read.orc(path)
      case Array("avro", path)    => spark.read.format("avro").load(path)
      case _                      => spark.read.parquet(spec)
    }
    df.select(Columns.map(col): _*).as[RepoFile]
  }
}
