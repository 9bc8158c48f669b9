package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Warehouse filesystem access through the Hadoop `FileSystem` API —
  * the SAME abstraction Spark's own parquet reader/writer resolves paths
  * with, so warehouse metadata (existence probes, the `_seq` counter,
  * index meta JSON, compaction renames) works wherever the data does:
  * local disk, HDFS, S3A, ABFS. `java.nio.file`/`java.io.File` would
  * silently report "missing" for any non-local URI — forcing a full
  * index rebuild per session and breaking mutation sequencing — which is
  * exactly the failure a 1000-executor deployment would hit first. */
object StoreIO {

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = fsFor(spark, path)
    fs.exists(p)
  }

  def readString(spark: SparkSession, path: String): String = {
    val (fs, p) = fsFor(spark, path)
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Overwrite-create a small text file (metadata-sized writes only). */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    ()
  }

  /** Recursive delete; no-op when absent. */
  def delete(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Rename (atomic per entry on HDFS/local; the cheap directory move
    * compaction relies on). */
  def rename(spark: SparkSession, from: String, to: String): Boolean = {
    val (fs, p) = fsFor(spark, from)
    fs.rename(p, new Path(to))
  }

  def mkdirs(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    fs.mkdirs(p); ()
  }

  /** Child entry names of a directory (empty when absent). */
  def list(spark: SparkSession, path: String): Seq[String] = {
    val (fs, p) = fsFor(spark, path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }
}
