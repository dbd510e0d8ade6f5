package graft.operators

import graft.sources.Formats
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `convert` op: read any supported format, write CSV / NDJSON / Parquet
  * (reference /root/reference/src/convert.rs:14-54).
  *
  * Parity choices:
  *  - `--single-file` → coalesce(1). Spark always writes a directory; the
  *    single part file inside is the analog of the reference's
  *    with_single_file_output (documented deviation).
  *  - `--zstd` → parquet zstd with level 8 (reference convert.rs:27).
  *  - reference always writes PLAIN encoding (convert.rs:26,32); closest
  *    Spark analog is disabling dictionary encoding.
  *  - Avro output rejected, Arrow unimplemented — exactly like the reference
  *    (convert.rs:37-39,52).
  *  - ORC in/out is a DOCUMENTED engine extension (the sniffer recognizes
  *    `.orc`, so convert must handle it rather than MatchError): the
  *    reference rejects it, we write it — see Formats.Orc and README's
  *    convert row. The avro/arrow rejections above stay reference-exact.
  *  - the reference stamps `created_by = "bdt"` into the parquet footer
  *    (convert.rs:25,31). Spark exposes no public hook for the writer
  *    created_by string (parquet-mr hardcodes its own), so our footers say
  *    "parquet-mr ... (build ...)" — a permanent, cosmetic-only deviation:
  *    no reader behavior keys off it, and view-parquet-meta surfaces
  *    whatever the footer says on both engines.
  */
object Convert {

  def convert(
      spark: SparkSession,
      input: String,
      output: String,
      singleFile: Boolean = false,
      zstd: Boolean = false): Unit = {

    val df0 = Formats.read(spark, input)
    // single-file output is inherently one encoder task; directory output
    // should use every core. A one-file local input arrives as ONE split, so
    // round-robin it across the cores first (zstd-8 encode of a 600 k-row
    // lineitem measured 5-10 s on one core vs <1 s spread). At 100 TB the
    // input has thousands of splits and the condition is never true — no
    // gratuitous shuffle at scale. Row order across output files is not
    // contractual for directory output (the reference's multi-file write is
    // partition-parallel too, convert.rs:22).
    val parallelism = spark.sparkContext.defaultParallelism
    val df =
      if (singleFile) df0.coalesce(1)
      else if (df0.rdd.getNumPartitions < parallelism) df0.repartition(parallelism)
      else df0

    Formats.fileFormat(output) match {
      case Right(Formats.Csv) =>
        df.write.mode("overwrite").option("header", "true").csv(output)
      case Right(Formats.Json) =>
        df.write.mode("overwrite").json(output)
      case Right(Formats.Parquet) =>
        // per-write options only: Spark folds writer options into the job's
        // Hadoop conf (newHadoopConfWithOptions), so the session-global conf
        // is never touched — a later plain write keeps dictionary encoding
        // (ConvertSpec pins this)
        df.write.mode("overwrite")
          .option("compression", if (zstd) "zstd" else "snappy")
          .option("parquet.compression.codec.zstd.level", "8")
          .option("parquet.enable.dictionary", "false")
          .parquet(output)
      case Right(Formats.Orc) =>
        // engine extension beyond the reference's convert targets (which
        // reject everything but csv/json/parquet): ORC is Spark-native and
        // the sniffer recognizes it, so .orc output must not MatchError
        df.write.mode("overwrite")
          .option("compression", if (zstd) "zstd" else "snappy")
          .orc(output)
      case Right(Formats.Avro) =>
        throw new IllegalArgumentException("avro output is not supported")
      case Left(err) =>
        throw new IllegalArgumentException(err)
    }
  }
}
