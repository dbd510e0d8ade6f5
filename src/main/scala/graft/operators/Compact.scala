package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction: rewrite a parquet directory so output files land
  * near a target size. The small-files problem is THE operational failure
  * mode of long-lived 100 TB tables (every downstream scan pays a task +
  * footer read per file; a few million 1 MB files can cost more in scheduling
  * than in IO). The reference has no equivalent (its tables are single files
  * by construction — /root/reference/src/convert.rs:22 single_file output);
  * extension operator.
  *
  * Shape: `coalesce(ceil(totalBytes / targetBytes))` between read and write —
  * coalesce, not repartition, so compaction is SHUFFLE-FREE: each output task
  * concatenates whole input splits. File sizes can vary up to ~2x around the
  * target (coalesce merges adjacent splits without rebalancing); that is the
  * accepted trade — a balanced repartition would move every byte through a
  * full shuffle just to even out file sizes. At 100 TB, prefer running this
  * per partition-directory (hive-partitioned tables) so each coalesce stays
  * narrow and partition pruning is preserved.
  */
object Compact {

  /** Parquet file count + total bytes under `dir` (non-recursive, data files
    * only — skips _SUCCESS / hidden files), via the Hadoop FS API so it works
    * on any cluster filesystem, not just local disk.
    */
  def stats(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (files.length, files.map(_.getLen).sum)
  }

  /** Rewrite `inDir` (parquet) into `outDir` with ~targetBytes output files.
    * Returns (filesBefore, filesAfter).
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (before, totalBytes) = stats(spark, inDir)
    val outFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .coalesce(outFiles)
      .write.mode("overwrite").parquet(outDir)
    val (after, _) = stats(spark, outDir)
    (before, after)
  }

  /** Compacted copy of `inDir` as a DataFrame (read back from `outDir`). */
  def compacted(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long): DataFrame = {
    compact(spark, inDir, outDir, targetBytes)
    spark.read.parquet(outDir)
  }
}
