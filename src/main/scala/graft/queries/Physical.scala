package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout operators: the storage-side levers that matter at 100 TB
  * (bucketing for co-located joins). Logical results stay oracle-checkable;
  * the PLAN properties are pinned in BucketedJoinSpec.
  */
object Physical {
  import Tables.t

  /** Co-located (bucketed) join: both sides pre-bucketed on the join key
    * with the same bucket count, so the join runs with NO exchange on either
    * input — at 100 TB this turns the nightly fact⋈dim join's two full-table
    * shuffles into zero. Here the bucketed copies are written once to
    * scratch (external tables in the in-memory catalog) and the join result
    * is oracle-checked; BucketedJoinSpec pins the plan property that the
    * SortMergeJoin has no shuffle below it (the only Exchange left is the
    * final aggregation's).
    *
    * The merge hint only forces SMJ over broadcast — it does not change the
    * result; at real scale neither side fits a broadcast anyway.
    */
  /** The bucketed fixture copies are LAYOUT, not query work: a production
    * table is bucketed once at write time and every nightly join reads it
    * for free, so re-writing both copies inside each timed run of the query
    * body charged the join ~2 write passes it would never pay in deployment
    * (VERDICT r4 #6). Written once per (fixture dir) and reused; the dir
    * marker drops when a different sf is requested.
    */
  private val bucketedFor = new java.util.concurrent.atomic.AtomicReference[String]()

  private def bucketedTables(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val names = Seq("customer" -> "c_custkey", "orders" -> "o_custkey")
    Tables.cachedFixture(bucketedFor, dir)(
      names.forall { case (tbl, _) => s.catalog.tableExists(s"graft_bucketed_$tbl") }) {
      names.foreach { case (table, key) =>
        val name = s"graft_bucketed_$table"
        s.sql(s"DROP TABLE IF EXISTS $name")
        t(s, dir, table)
          .write.mode("overwrite")
          .bucketBy(8, key).sortBy(key)
          .option("path", Tables.scratch(s"bucketed_$table"))
          .saveAsTable(name)
      }
    }
  }

  /** Bench warmup hook: pre-build the cached fixture layout. */
  private[graft] def warmFixtures(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    bucketedTables(s, dir)

  val bucketedJoin = Declared(
    "q_bucketed_join",
    (s, dir) => {
      bucketedTables(s, dir)
      val cust = s.table("graft_bucketed_customer")
      val ord = s.table("graft_bucketed_orders")
      cust.hint("merge")
        .join(ord, cust("c_custkey") === ord("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      round(sum(o_totalprice), 2) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** The fact⋈dim join with a selective dim filter, under the confs that let
    * Catalyst inject a RUNTIME BLOOM FILTER: the dim side's join keys are
    * sketched into a bloom filter during planning-time subquery execution and
    * `might_contain` is pushed into the fact scan, so fact rows that cannot
    * match never reach the shuffle. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling the ~1% that survives the
    * dim filter. Thresholds are lowered only because the fixture is tiny —
    * production sizes clear the defaults on their own; autoBroadcast is
    * disabled because a broadcast join needs no runtime filter (the broadcast
    * IS the filter). BloomFilterJoinSpec pins `might_contain` in the plan.
    * localCheckpoint materializes while the confs are active, then they are
    * restored so no other query inherits them.
    */
  val runtimeBloom = Declared(
    "q_runtime_bloom",
    (s, dir) => {
      val overrides = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
      val saved = overrides.map { case (k, _) => k -> s.conf.getOption(k) }
      try {
        overrides.foreach { case (k, v) => s.conf.set(k, v) }
        bloomJoin(s, dir).localCheckpoint()
      } finally saved.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _))
      }
    },
    Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
      round(sum(l_extendedprice), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#4'
      GROUP BY p_brand ORDER BY p_brand"""))

  /** The join under test, factored out so BloomFilterJoinSpec can inspect its
    * plan with the runtime-filter confs active.
    */
  private[graft] def bloomJoin(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#4")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** STORAGE bloom filters (the write-side complement of q_runtime_bloom's
    * runtime filter): write with `parquet.bloom.filter.enabled#<col>` on the
    * point-lookup keys and prove the filters landed on exactly those columns
    * — the layout knob that makes needle-in-haystack key lookups skip row
    * groups without any index service. The Spark side is a FUNCTIONAL check:
    * every row group must carry a bloom offset AND the deserialized filter
    * must answer positive for that row group's footer-stats minimum (a value
    * known to be present) — not just "offset field set". The oracle reads
    * the column list back from the WRITTEN file via DuckDB's
    * parquet_metadata() (scratch is machine-local and Verify runs before the
    * oracle), so the column inventory is cross-engine recomputed; only the
    * has_bloom POLICY (blooms on the two requested keys) stays pinned —
    * this environment's DuckDB 1.0.0 predates the bloom_filter_offset
    * metadata column (added in 1.2) that would let it recompute presence
    * itself.
    */
  val parquetBloom = Declared(
    "op_parquet_bloom",
    (s, dir) => {
      import scala.jdk.CollectionConverters._
      val out = Tables.scratch("bloom_parquet")
      // parquet-java SKIPS the bloom when a column ends up fully
      // dictionary-encoded (the dictionary already is an exact filter), so
      // the bloom columns also turn dictionary off — the realistic shape
      // anyway: blooms earn their bytes exactly on high-cardinality keys
      // where dictionaries stop working
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.bloom.filter.enabled#l_partkey", "true")
        .option("parquet.enable.dictionary#l_orderkey", "false")
        .option("parquet.enable.dictionary#l_partkey", "false")
        .parquet(out)
      // Hadoop FS, not java.io.File — same discipline as Compact.stats, so
      // the footer probe keeps working on a non-local filesystem; and ALL
      // row groups are asserted, not just block 0: a column counts as
      // bloom-covered only if every row group carries the filter
      val conf = s.sparkContext.hadoopConfiguration
      val outPath = new org.apache.hadoop.fs.Path(out)
      val fs = outPath.getFileSystem(conf)
      val part = fs.listStatus(outPath).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).headOption
        .getOrElse(sys.error(s"no parquet part file under $out"))
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, conf))
      val rows =
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          require(blocks.nonEmpty, s"no row groups in $part")
          // functional per-row-group check: offset present, filter
          // deserializes, and the row group's own min value (from footer
          // stats — no data pages read) tests positive
          def bloomWorks(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean =
            c.getBloomFilterOffset >= 0L && {
              val bf = reader.readBloomFilter(c)
              bf != null && {
                val stats = c.getStatistics
                require(stats != null && !stats.isEmpty,
                  s"no footer stats for ${c.getPath.toDotString} — cannot pick a known-present probe value")
                val h = stats.genericGetMin match {
                  case l: java.lang.Long => bf.hash(l.longValue())
                  case i: java.lang.Integer => bf.hash(i.intValue())
                  case d: java.lang.Double => bf.hash(d.doubleValue())
                  case f: java.lang.Float => bf.hash(f.floatValue())
                  case b: org.apache.parquet.io.api.Binary => bf.hash(b)
                  case o => bf.hash(o)
                }
                bf.findHash(h)
              }
            }
          blocks
            .flatMap(_.getColumns.asScala
              .map(c => (c.getPath.toDotString, bloomWorks(c))))
            .groupBy(_._1).toSeq
            .map { case (p, perBlock) => (p, perBlock.forall(_._2)) }
        } finally reader.close()
      import s.implicits._
      rows.toDF("path_in_schema", "has_bloom").orderBy(col("path_in_schema"))
    },
    Some(s"""SELECT path_in_schema,
        path_in_schema IN ('l_orderkey', 'l_partkey') AS has_bloom
      FROM (SELECT DISTINCT path_in_schema
            FROM parquet_metadata('${Tables.scratch("bloom_parquet")}/*.parquet'))
      ORDER BY path_in_schema"""))

  /** Aggregation on the bucket key — the OTHER free ride a bucketed layout
    * buys besides [[bucketedJoin]]: grouping by the column the table is
    * bucketed on needs NO exchange, because the scan already reports
    * HashPartitioning(o_custkey, 8) and that satisfies the aggregate's
    * clustered-distribution requirement. At 100 TB this is every nightly
    * per-customer rollup reading the fact table shuffle-free. The first
    * (per-customer) aggregate runs exchange-free on bucket layout; only the
    * second, tiny aggregate (customers-per-order-count histogram — at most
    * a few dozen distinct counts) shuffles. ZeroExchangeAggSpec pins the
    * plan property: no Exchange between the scan and the first aggregate.
    */
  val bucketedAgg = Declared(
    "q_bucketed_agg",
    (s, dir) => {
      bucketedTables(s, dir)
      s.table("graft_bucketed_orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))   // exchange-free: bucket layout
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers")) // tiny: one row per count value
        .orderBy(col("n_orders"))
    },
    Some("""SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers FROM (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey)
      GROUP BY n_orders ORDER BY n_orders"""))

  val all: Seq[Declared] = Seq(bucketedJoin, runtimeBloom, parquetBloom, bucketedAgg)
}
