package graft

import graft.functions.ZOrder
import graft.operators.Compact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit interleave matches hand-computed Morton key") {
    // x=5 (0101b) at even bit positions, y=3 (0011b) at odd:
    // x: bits 0,2 set -> key bits 0,4 -> 1+16; y: bits 0,1 set -> key bits 1,3 -> 2+8
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zKey(Seq($"x", $"y"), 4).as("z"))
      .head().getLong(0)
    assert(got == 27L)
  }

  test("quadrant containment: both coords < 2^k iff zkey < 4^k") {
    val grid = spark.range(16).toDF("x")
      .crossJoin(spark.range(16).toDF("y"))
      .select($"x", $"y", ZOrder.zKey(Seq($"x", $"y"), 4).as("z"))
    val inQuad = grid.filter($"x" < 8 && $"y" < 8)
    assert(inQuad.agg(max($"z")).head().getLong(0) < 64L)
    val outQuad = grid.filter($"x" >= 8 || $"y" >= 8)
    assert(outQuad.agg(min($"z")).head().getLong(0) >= 64L)
  }

  test("zOrderSql mirror computes the identical key") {
    // the generated SQL is plain ANSI bit arithmetic, so Spark itself can
    // evaluate the DuckDB-dialect string — cross-checks the two generators
    val sql = ZOrder.zOrderSql(Seq("x", "y"), 6)
    val diff = spark.range(64).toDF("x")
      .crossJoin(spark.range(64).toDF("y"))
      .select(
        ZOrder.zKey(Seq($"x", $"y"), 6).as("a"),
        expr(sql).as("b"))
      .filter($"a" =!= $"b")
      .count()
    assert(diff == 0L)
  }
}

/** The q_runtime_bloom query's reason to exist is the runtime filter: with
  * the confs active, Catalyst must inject a bloom-filter `might_contain`
  * predicate on the fact side of the join (InjectRuntimeFilter). Result
  * correctness is the oracle's job; the PLAN property is pinned here.
  */
class BloomFilterJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("runtime bloom filter is injected into the fact side") {
    val overrides = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val plan = graft.queries.Physical.bloomJoin(spark, TestSpark.sf)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"), s"no runtime bloom filter in plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}

/** Proof of the zorder_layout claim at the STORAGE layer: writing the table
  * sorted by the Morton key must leave every parquet row group with narrow
  * min/max ranges on BOTH interleaved dimensions (checked via the real
  * footer stats through ParquetMeta), which is exactly what row-group
  * pruning keys on. A single-dimension sort gets narrow ranges only on the
  * leading column — the second dimension stays near the full domain.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z-sorted write narrows row-group stats on both dimensions") {
    import graft.operators.ParquetMeta
    val n = 1 << 16
    val xs = spark.range(n).select(
      (col("id") % 256).as("px"), ((col("id") / 256) % 256).as("sx"))
    def rowGroupSpread(dir: String): Map[String, Double] = {
      val file = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head.getAbsolutePath
      ParquetMeta.metadata(spark, file)
        .select(col("path_in_schema").as("c"),
          (col("stats_max_value").cast("double") - col("stats_min_value").cast("double")).as("spread"))
        .groupBy(col("c")).agg(avg(col("spread")).as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val zDir = Tables.scratch("zorder_spec_z")
    val linDir = Tables.scratch("zorder_spec_lin")
    val rowsPerGroup = 4096
    // tiny parquet.block.size → many row groups per file, so the footer
    // stats give a meaningful per-group spread sample from 64k rows
    def write(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
      df.coalesce(1).sortWithinPartitions(col("k"))
        .write.mode("overwrite")
        .option("parquet.block.size", (rowsPerGroup * 16).toString)
        .parquet(dir)
    write(xs.select(graft.functions.ZOrder.zKey(Seq($"px", $"sx"), 8).as("k"), $"px", $"sx"), zDir)
    write(xs.select($"px".as("k"), $"px", $"sx"), linDir)
    val z = rowGroupSpread(zDir)
    val lin = rowGroupSpread(linDir)
    // z-order: both dimensions narrow; linear: sx stays ~full-domain (255)
    assert(z("px") < 100 && z("sx") < 100, s"z spreads: $z")
    assert(lin("sx") > 200, s"linear spreads: $lin")
    assert(z("sx") < lin("sx") / 2)
  }
}

/** Containment vs Jaccard on an embedded sub-document: the exact case
  * dedup_containment exists for — a small doc fully contained in a larger
  * one scores containment ≈ 1 while Jaccard stays below any dedup cut.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("embedded sub-document: containment ~1, jaccard well below 0.5") {
    import graft.functions.TextFns
    val small = "the quick brown fox jumps over the lazy dog again and again"
    val big = small + " " + (1 to 40).map(i => s"filler sentence number $i with unique words").mkString(" ")
    val row = Seq((small, big)).toDF("a", "b")
      .select(
        TextFns.jaccard(TextFns.charShingles("a", 8), TextFns.charShingles("b", 8)).as("j"),
        (size(array_intersect(TextFns.charShingles("a", 8), TextFns.charShingles("b", 8))).cast("double") /
          least(size(TextFns.charShingles("a", 8)), size(TextFns.charShingles("b", 8))).cast("double")).as("c"))
      .head()
    assert(row.getDouble(0) < 0.2, s"jaccard=${row.getDouble(0)}")
    assert(row.getDouble(1) > 0.95, s"containment=${row.getDouble(1)}")
  }
}

class CliExtensionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("describe and compact CLI verbs dispatch cleanly") {
    val in = Tables.scratch("cli_compact_in")
    val out = Tables.scratch("cli_compact_out")
    spark.range(1000).toDF("v").repartition(4).write.mode("overwrite").parquet(in)
    assert(graft.cli.Main.dispatch(spark, List("describe", in)) == 0)
    assert(graft.cli.Main.dispatch(spark,
      List("compact", in, out, "--target-mb", "512")) == 0)
    assert(spark.read.parquet(out).count() == 1000L)
  }

  test("schema-diff CLI verb: exit 0 on same schema, -1 on drift") {
    val a = Tables.scratch("cli_sdiff_a")
    val b = Tables.scratch("cli_sdiff_b")
    spark.range(10).toDF("v").write.mode("overwrite").parquet(a)
    spark.range(10).toDF("v")
      .withColumn("extra", org.apache.spark.sql.functions.lit("x"))
      .write.mode("overwrite").parquet(b)
    assert(graft.cli.Main.dispatch(spark, List("schema-diff", a, a)) == 0)
    assert(graft.cli.Main.dispatch(spark, List("schema-diff", a, b)) == -1)
  }
}

/** Exactly-once across a RESTART: the property that makes Structured
  * Streaming deployable — a stopped query resumed from its checkpoint must
  * process each input file exactly once (no loss, no duplication), even
  * though the second run never sees the first run's batches.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("file-sink stream resumed from checkpoint emits each row exactly once") {
    val in = Tables.scratch("recovery_in")
    val out = Tables.scratch("recovery_out")
    val ckpt = Tables.scratch("recovery_ckpt")
    Seq(in, out, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    new java.io.File(in).mkdirs()

    def writeBatch(from: Long, n: Long): Unit =
      spark.range(from, from + n).toDF("v")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
        .parquet(in)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }

    writeBatch(0, 1000)
    runOnce()                      // processes file A, checkpoints, stops
    writeBatch(1000, 500)
    runOnce()                      // resumed run must process ONLY file B
    val got = spark.read.parquet(out)
    assert(got.count() == 1500L, "row count after restart")
    assert(got.agg(countDistinct(col("v"))).head().getLong(0) == 1500L,
      "no duplicated rows across the restart")
  }
}

/** At 100 TB streaming state the deployment answer is
  * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`
  * (state lives in per-executor RocksDB instances instead of the JVM heap,
  * so state size is bounded by disk, not memory). The streaming queries are
  * provider-agnostic; this spec proves the RocksDB provider actually runs in
  * this environment (rocksdbjni is on the classpath) and returns the same
  * answers as the default HDFS-backed store.
  */
class RocksDbStateStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import scala.jdk.CollectionConverters._

  test("stateful streaming agg runs on RocksDBStateStoreProvider, same results") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"${TestSpark.sf}/events.parquet").schema
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(TestSpark.sf)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_rocksdb_sink").start()
      val metrics =
        try {
          q.processAllAvailable()
          Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
            .flatMap(_.customMetrics.keySet().asScala)
        } finally q.stop()
      // the state operator's custom metrics are provider-specific: rocksdb*
      // keys appear only when the RocksDB store actually backed the agg
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"state metrics carry no rocksdb evidence: $metrics")
      val got = spark.table("graft_rocksdb_sink").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Tables.t(spark, TestSpark.sf, "events")
        .groupBy(col("event_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, "RocksDB-backed result differs from batch truth")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDirs(tag: String): (String, String) =
    (Tables.scratch(s"compact_spec_in_$tag"), Tables.scratch(s"compact_spec_out_$tag"))

  test("compaction to a huge target collapses to one file, content preserved") {
    val (in, out) = freshDirs("one")
    spark.range(100000).toDF("v").repartition(16)
      .write.mode("overwrite").parquet(in)
    val (before, after) = Compact.compact(spark, in, out, 1L << 30)
    assert(before == 16 && after == 1, s"before=$before after=$after")
    val got = spark.read.parquet(out)
    assert(got.count() == 100000L)
    assert(got.agg(sum(col("v"))).head().getLong(0) == 100000L * 99999 / 2)
  }

  test("target smaller than total yields multiple files near ceil(total/target)") {
    val (in, out) = freshDirs("multi")
    spark.range(200000).toDF("v").repartition(32)
      .write.mode("overwrite").parquet(in)
    val (_, total) = Compact.stats(spark, in)
    val target = total / 4
    val (_, after) = Compact.compact(spark, in, out, target)
    val expected = ((total + target - 1) / target).toInt
    assert(after == expected, s"after=$after expected=$expected")
    assert(spark.read.parquet(out).count() == 200000L)
  }
}

/** embed_quantize's zero-vector guard: an all-zero embedding has max|x| = 0,
  * and without the nullif guard scale 0 makes q = x/0 NaN (Spark) vs Inf
  * (DuckDB) — a latent oracle break the fixtures never trip. The guard must
  * turn the whole quantized row into deterministic NULLs while leaving
  * normal vectors untouched.
  */
class EmbedQuantizeZeroVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("all-zero vector quantizes to NULL scale/stats, normal vector unchanged") {
    val dir = Tables.scratch("quantize_zero_spec")
    Seq(
      (1L, Seq(0f, 0f, 0f, 0f), 0),
      (2L, Seq(1f, -2f, 0.5f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = graft.queries.Coverage3.embedQuantize.run(spark, dir)
      .collect().sortBy(_.getLong(0))

    val zero = rows(0)
    assert(zero.isNullAt(1) && zero.isNullAt(2) && zero.isNullAt(3) && zero.isNullAt(4),
      s"zero vector must yield NULL scale and stats, got $zero")

    val normal = rows(1)
    // scale = 2/127; q = floor(x*127/2 + 0.5) = [64, -127, 32, 0]
    assert(math.abs(normal.getDouble(1) - 2.0 / 127.0) < 1e-9)
    assert(normal.getLong(2) == -31L, s"q_sum: $normal")
    assert(normal.getLong(3) == -127L, s"q_min: $normal")
    assert(normal.getLong(4) == 64L, s"q_max: $normal")
  }
}

/** Round-5 robustness pins (VERDICT r4 #7): partitioned-dir Compact behavior,
  * Describe identifier safety, CLI usage-error paths.
  */
class CompactPartitionedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stats recurses into hive partitions; compact fails fast on them") {
    val in = Tables.scratch("compact_part_spec_in")
    spark.range(10000).toDF("v")
      .withColumn("p", col("v") % 4)
      .write.mode("overwrite").partitionBy("p").parquet(in)

    val (files, bytes) = Compact.stats(spark, in)
    assert(files >= 4, s"partitioned data files not counted: $files")
    assert(bytes > 0L, "partitioned bytes must not read as 0 (pre-fix coalesce(1) bug)")

    val e = intercept[IllegalArgumentException] {
      Compact.compact(spark, in, Tables.scratch("compact_part_spec_out"), 1L << 20)
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
  }

  test("stats on a RELATIVE input path under a hidden ancestor still counts data") {
    // an unqualified dir never equals the fs-qualified file URIs at the
    // ancestor-walk stop sentinel, so the walk escapes the input dir; with a
    // hidden ancestor component (.hidden here, a dot-dir in cwd in the wild)
    // every file classifies non-data → stats (0, 0) → silent coalesce(1)
    val abs = Tables.scratch("compact_rel_spec") + "/.hidden/in"
    spark.range(1000).toDF("v").coalesce(2).write.mode("overwrite").parquet(abs)
    val cwd = new java.io.File(".").getCanonicalPath
    val rel = java.nio.file.Paths.get(cwd).relativize(java.nio.file.Paths.get(abs)).toString
    val (files, bytes) = Compact.stats(spark, rel)
    assert(files == 2 && bytes > 0L, s"relative-path stats broken: ($files, $bytes)")
  }

  test("an empty or metadata-only subdirectory does not abort compaction") {
    val in = Tables.scratch("compact_emptydir_spec_in")
    spark.range(1000).toDF("v").coalesce(2).write.mode("overwrite").parquet(in)
    new java.io.File(s"$in/leftover_tmp").mkdirs()      // empty subdir
    new java.io.File(s"$in/backup/_staging").mkdirs()   // metadata-only subdir
    val out = Tables.scratch("compact_emptydir_spec_out")
    val (before, after) = Compact.compact(spark, in, out, 1L << 30)
    assert(before == 2 && after >= 1)
  }
}

class DescribeQuotingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column names with dots, spaces and hyphens survive describe") {
    val df = Seq((1.0, 2.0, 3.0), (3.0, 4.0, 5.0))
      .toDF("a.b", "a b", "a-b")
    val got = graft.operators.Describe.describe(df, Seq("a.b", "a b", "a-b"))
      .orderBy(col("col_name")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a b", "a-b", "a.b"))
    // values flow through, not just names: mean of a.b is 2.0
    val ab = got.find(_.getString(0) == "a.b").get
    assert(ab.getLong(1) == 2L && ab.getDouble(3) == 2.0)
  }
}

class CliUsageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("missing positionals yield exit 1, not an exception") {
    assert(graft.cli.Main.dispatch(spark, List("view")) == 1)
    assert(graft.cli.Main.dispatch(spark, List("schema")) == 1)
    assert(graft.cli.Main.dispatch(spark, List("count")) == 1)
    assert(graft.cli.Main.dispatch(spark, List("convert", "only-one")) == 1)
    assert(graft.cli.Main.dispatch(spark, List("compare", "one")) == 1)
    assert(graft.cli.Main.dispatch(spark, List("describe")) == 1)
    assert(graft.cli.Main.dispatch(spark, List("compact", "in-only")) == 1)
    assert(graft.cli.Main.dispatch(spark, List("query")) == 1)
  }

  test("describe with zero numeric columns yields exit 1") {
    import spark.implicits._
    val p = Tables.scratch("cli_usage_strings.parquet")
    Seq("x", "y").toDF("s").write.mode("overwrite").parquet(p)
    assert(graft.cli.Main.dispatch(spark, List("describe", p)) == 1)
  }
}

/** SQL reachability of the native kernels: both registration paths must
  * resolve the functions — injector applied to a SparkSessionExtensions
  * (the spark.sql.extensions path) and register() on a live session.
  */
class SqlKernelRegistrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("register() exposes the kernels to spark.sql with correct values") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash('abc') AS rh, md5_pair('abc') AS mp,
         cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""").head()
    // rolling_hash('abc') = ((97*31+98)*31+99) % 1e9+7
    assert(r.getLong(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(r.getSeq[Long](1).length == 2)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
  }

  test("the extensions injector registers resolvable functions (spark.sql.extensions path)") {
    // building a second SparkSession in one JVM returns the existing one, so
    // drive the exact mechanism session construction uses: apply the
    // injector to a fresh SparkSessionExtensions, register into a clean
    // FunctionRegistry, and resolve + evaluate a function through it
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftFunctionBridge
      .applyExtensions(ext, FunctionRegistry.builtin.clone())
    for (n <- Seq("cosine_sim", "md5_pair", "rolling_hash"))
      assert(reg.functionExists(FunctionIdentifier(n)), s"$n not registered")
    val e = reg.lookupFunction(FunctionIdentifier("rolling_hash"), Seq(Literal("abc")))
    assert(e.eval(null) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("wrong arity raises a categorized AnalysisException, not a raw require") {
    graft.GraftExtensions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT)))").head()
    }
    assert(e.getCondition != null && e.getCondition.startsWith("WRONG_NUM_ARGS"),
      s"condition=${e.getCondition} msg=${e.getMessage}")
  }
}

/** Pins the two foreachBatch-upsert contracts the fixture stream cannot show
  * (its single file arrives as one micro-batch): (1) the merge is genuinely
  * incremental — two files driven as two micro-batches produce the same
  * target as one batch over their union; (2) the batchId gate makes replay
  * idempotent — re-delivering an already-merged batchId (what the engine
  * does after a crash mid-commit) must not double-count the additive
  * n_events column.
  */
class UpsertReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.streaming.StreamingOps

  private def events(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "event_type", "ts_str")
      .withColumn("ts", col("ts_str").cast("timestamp_ntz")).drop("ts_str")
  }

  test("two micro-batches merge incrementally and replayed batchIds are skipped") {
    val in = Tables.scratch("upsert_in")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(in))
    new java.io.File(in).mkdirs()
    val a = events(Seq(
      (1L, 10L, "view", "2024-01-01 10:00:00"),
      (2L, 11L, "click", "2024-01-01 10:05:00")))
    val b = events(Seq(
      (2L, 12L, "purchase", "2024-01-01 11:00:00"),
      (3L, 13L, "view", "2024-01-01 11:30:00")))
    a.coalesce(1).write.mode("append").parquet(in)
    b.coalesce(1).write.mode("append").parquet(in)

    StreamingOps.upsertReset()
    val batchIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema(a.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batchIds.synchronized { batchIds += id }
        StreamingOps.upsertStep(id, batch.toDF())
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batchIds.distinct.size >= 2,
      s"maxFilesPerTrigger=1 over two files should yield >=2 micro-batches, got $batchIds")

    def readout = StreamingOps.upsertSnapshot.get
      .select(col("user_id"), col("last.event_type").as("t"),
        col("last.ts").as("ts"), col("n_events"))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.get(2).toString, r.getLong(3))).toSeq

    val expected = Seq(
      (1L, "view", "2024-01-01T10:00", 1L),
      (2L, "purchase", "2024-01-01T11:00", 2L),
      (3L, "view", "2024-01-01T11:30", 1L))
    assert(readout == expected, s"incremental merge diverged: $readout")

    // crash-replay: the engine re-delivers the LAST batchId after recovery
    StreamingOps.upsertStep(batchIds.max, b)
    assert(readout == expected, "replayed batchId was merged twice")

    // and a genuinely new batch still lands
    StreamingOps.upsertStep(batchIds.max + 1,
      events(Seq((3L, 14L, "click", "2024-01-01 12:00:00"))))
    assert(readout.find(_._1 == 3L).get == (3L, "click", "2024-01-01T12:00", 2L),
      "post-replay batch with a fresh id must merge")
  }
}

/** Streaming DQ gate: additive counters must sum correctly across batches
  * and stay replay-idempotent — the two properties that make the running
  * ledger equal the batch evaluation after any chop of the stream.
  */
class QualityGateReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import graft.streaming.StreamingOps

  private def batch(rows: Seq[(String, Long, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_type", "user_id", "value", "ts_str")
      .withColumn("ts", col("ts_str").cast("timestamp_ntz")).drop("ts_str")
  }

  test("ledger sums across batches and skips replayed batchIds") {
    StreamingOps.gateReset()
    // batch 0: one bad type + one range violation; batch 1: one bad uid
    StreamingOps.gateStep(0L, batch(Seq(
      ("view", 1L, 10.0, "2024-01-01 10:00:00"),
      ("BOGUS", 2L, 20.0, "2024-01-01 10:01:00"),
      ("click", 3L, 500.0, "2024-01-01 10:02:00"))))
    StreamingOps.gateStep(1L, batch(Seq(
      ("purchase", -7L, 30.0, "2024-01-01 11:00:00"))))
    def readout = StreamingOps.gateSnapshot.get
      .orderBy(col("check_name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Seq(
      ("event_type_known", 4L, 1L),
      ("ts_not_null", 4L, 0L),
      ("user_id_positive", 4L, 1L),
      ("value_in_0_100", 4L, 1L))
    assert(readout == expected, s"cross-batch ledger diverged: $readout")

    // crash-replay of batch 1 must not double-count
    StreamingOps.gateStep(1L, batch(Seq(
      ("purchase", -7L, 30.0, "2024-01-01 11:00:00"))))
    assert(readout == expected, "replayed batch was counted twice")

    // a fresh batch still lands
    StreamingOps.gateStep(2L, batch(Seq(
      ("view", 9L, 1.0, "2024-01-01 12:00:00"))))
    assert(readout.head == ("event_type_known", 5L, 1L))
  }

  test("HLL stream state is replay-idempotent without a batchId gate") {
    import spark.implicits._
    StreamingOps.hllReset()
    val b = Seq(("view", 1L), ("view", 2L), ("click", 3L))
      .toDF("event_type", "user_id")
    StreamingOps.hllStep(b)
    def est = StreamingOps.hllSnapshot.get
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).as("e"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val first = est
    assert(first == Seq(("click", 1L), ("view", 2L)))
    // re-merging the identical batch's sketch must not move any estimate:
    // HLL union is a per-register max, so replay is a no-op by construction
    StreamingOps.hllStep(b)
    assert(est == first, "replayed sketch merge changed the estimates")
    // new users still register
    StreamingOps.hllStep(Seq(("click", 4L)).toDF("event_type", "user_id"))
    assert(est == Seq(("click", 2L), ("view", 2L)))
  }
}

/** The persisted IVF-PQ index is partitioned by coarse cell so a probe is a
  * partition-pruned scan: this pins that the codes scan carries a static
  * cell PartitionFilter and lists only the 2 probed directories of 4 —
  * the property that makes a billion-vector stored index readable at 2/kc
  * of its size per query.
  */
class StoredIndexPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sim_ivfpq_stored scans only the probed cell partitions") {
    val df = SparkEntry.queries("sim_ivfpq_stored")(spark, TestSpark.sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("ivfpq_index/codes")) => f
    }
    assert(scans.nonEmpty, "no scan over the persisted codes table in the plan")
    val pf = scans.head.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("cell"), s"codes scan has no cell partition filter: $pf")
    assert(scans.head.selectedPartitions.partitionCount == 2,
      s"probe should list exactly 2 of 4 cell partitions, " +
        s"got ${scans.head.selectedPartitions.partitionCount}")
    // and the result itself still matches the inline variant
    val stored = df.collect().map(_.toSeq).toSeq
    val inline = SparkEntry.queries("sim_ivfpq")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    assert(stored == inline, "stored-index probe diverged from inline IVF-PQ")
  }
}
