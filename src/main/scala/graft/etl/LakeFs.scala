package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared lake-directory probing. */
object LakeFs {

  /** True when `path` exists and contains at least one non-hidden entry —
    * i.e. something Spark's file index would actually read. Leftovers of
    * a failed write (`_temporary`, a lone `_SUCCESS`) don't count, same
    * as Spark's own listing rules.
    */
  def nonEmptyDataDir(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Recursive delete of a scratch directory (no-op when absent). */
  def deleteRecursively(spark: SparkSession, p: Path): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
