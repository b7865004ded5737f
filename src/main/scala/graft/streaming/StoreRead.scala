package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared guard for the streaming stores' read paths (advisor r8).
  *
  * A store/audit directory can be UNREADABLE by `spark.read.parquet` in
  * two distinct states that are both legitimate mid-pipeline moments:
  * the directory does not exist yet (no batch has committed), or it
  * exists but holds no parquet footers — an empty dynamic-overwrite
  * write (every row filtered out, e.g. a clean decontamination batch)
  * leaves only `_SUCCESS` behind. `Novelty.priorStore` guarded the
  * first state; this helper covers both so every reader can fall back
  * to a schema-stable empty frame instead of throwing
  * path-not-found / schema-inference errors at a panel query. */
object StoreRead {

  /** True iff `dirStr` exists and contains at least one parquet data
    * file (footer), searching recursively through partition dirs.
    * Metadata files (`_SUCCESS`, `.*.crc`, …) do not count. */
  def hasParquetData(spark: SparkSession, dirStr: String): Boolean = {
    val dir = new Path(dirStr)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return false
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        return true
    }
    false
  }
}
