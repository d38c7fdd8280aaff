package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Small-file + tree operations routed through the Hadoop FileSystem of the
 * target path, so store maintenance (table swaps, deletes, config files)
 * works on HDFS/S3A/file: URIs alike — never `java.io.File`, which silently
 * no-ops against a remote store.
 */
object Fs {

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = fsFor(spark, path); fs.exists(p)
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Replace `path` with `nextPath` (delete-then-rename; the two-phase write
    * pattern used for read-modify-write table updates). */
  def swap(spark: SparkSession, path: String, nextPath: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    val next = new Path(nextPath)
    if (fs.exists(next)) {
      if (fs.exists(p)) fs.delete(p, true)
      fs.rename(next, p); ()
    }
  }

  def write(spark: SparkSession, path: String, content: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, path: String): Option[String] = {
    val (fs, p) = fsFor(spark, path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }
}
