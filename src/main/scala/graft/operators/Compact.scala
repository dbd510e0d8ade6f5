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

  /** Parquet file count + total bytes under `dir` (RECURSIVE, data files
    * only — skips _SUCCESS / hidden files and anything under a hidden or
    * metadata subdirectory), via the Hadoop FS API so it works on any
    * cluster filesystem, not just local disk. Recursion matters: a
    * hive-partitioned directory keeps its data one level down, and the
    * previous non-recursive listing reported 0 bytes there — which silently
    * turned [[compact]] into coalesce(1).
    */
  def stats(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var count = 0
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && isDataUnder(fs, p)(s.getPath)) { count += 1; bytes += s.getLen }
    }
    (count, bytes)
  }

  /** Every path component from `root` (exclusive) down to `path` must be
    * non-hidden/non-metadata. The stop sentinel compares QUALIFIED paths:
    * `fs.listFiles` hands back fully-qualified URIs, so a relative `root`
    * would never match its own qualified form and the walk would escape the
    * input directory (classifying everything under any hidden ancestor —
    * e.g. a `.work` home component — as non-data).
    */
  private def isDataUnder(fs: org.apache.hadoop.fs.FileSystem, root: Path)(
      path: Path): Boolean = {
    val qroot = fs.makeQualified(root)
    Iterator.iterate(fs.makeQualified(path))(_.getParent)
      .takeWhile(q => q != null && q != qroot)
      .forall { q =>
        val n = q.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
  }

  /** True when `dir` contains DATA FILES below the top level (hive
    * partitioning) — [[compact]] refuses those; see its doc. An empty or
    * metadata-only subdirectory (a leftover temp dir, `_delta_log`, …) is
    * not partitioning and must not abort a working compaction.
    */
  private def hasNestedData(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      s.isDirectory && !n.startsWith("_") && !n.startsWith(".") && {
        val it = fs.listFiles(s.getPath, true)
        var found = false
        while (!found && it.hasNext) {
          val f = it.next()
          found = f.isFile && isDataUnder(fs, s.getPath)(f.getPath)
        }
        found
      }
    }
  }

  /** Rewrite `inDir` (parquet) into `outDir` with ~targetBytes output files.
    * Returns (filesBefore, filesAfter).
    *
    * Refuses a hive-partitioned input (data files below the top level): a
    * flat rewrite would inline the partition columns and destroy partition
    * pruning for every downstream scan. Compact each partition directory
    * instead — which is also the right granularity at 100 TB (each coalesce
    * stays narrow).
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(!hasNestedData(spark, inDir),
      s"$inDir is partitioned (data in subdirectories); compact each partition directory separately " +
        "so partition columns and pruning are preserved")
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
