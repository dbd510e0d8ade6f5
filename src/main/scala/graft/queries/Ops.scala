package graft.queries

import graft.{Declared, Tables}
import graft.operators.{Compare, Convert, ParquetMeta, SchemaOp}
import org.apache.spark.sql.functions._

/** The reference's native operators (SURVEY §2.A), each declared as a judged
  * query. view/schema/count are trivially SQL-checkable; convert and compare
  * are exercised through deterministic round trips; parquet-meta is checked
  * against DuckDB's parquet_metadata() on the fixed sf0.01 verify path.
  */
object Ops {
  import Tables.t

  /** op 1 `view`: first N rows. The reference shows file order; we order by
    * the primary key so the result is well-defined under parallel scans.
    */
  val view = Declared(
    "op_view",
    (s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        .limit(10),
    Some("""SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 10"""))

  /** op 2 `schema`: information_schema.columns shape. */
  val schemaQ = Declared(
    "op_schema",
    (s, dir) => SchemaOp.describe(s, t(s, dir, "lineitem")),
    Some("""SELECT column_name, data_type, is_nullable,
      CAST(ordinal_position AS INTEGER) AS ordinal_position
      FROM information_schema.columns WHERE table_name = 'lineitem'
      ORDER BY ordinal_position"""))

  /** op 3 `count`. */
  val countQ = Declared(
    "op_count",
    (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n")),
    Some("SELECT count(*) AS n FROM lineitem"))

  /** op 4 `convert`: parquet → zstd parquet (single file, dictionary off)
    * round trip; the re-read aggregate proves losslessness.
    */
  val convertRoundtrip = Declared(
    "op_convert_roundtrip",
    (s, dir) => {
      val out = s"/tmp/graft_convert/lineitem_zstd.parquet"
      Convert.convert(s, s"$dir/lineitem.parquet", out, singleFile = true, zstd = true)
      s.read.parquet(out)
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    },
    Some("""SELECT count(*) AS n, round(sum(l_quantity),2) AS sum_qty,
      round(sum(l_extendedprice),2) AS sum_price FROM lineitem"""))

  /** op 7 `compare`: equal inputs → zero diffs. */
  val compareEqual = Declared(
    "op_compare_equal",
    (s, dir) => {
      val sorted = t(s, dir, "lineitem").orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      Compare.summarize(s, sorted, sorted)
    },
    Some("""SELECT count(*) AS rows_left, count(*) AS rows_right,
      CAST(0 AS BIGINT) AS n_diffs, CAST(NULL AS BIGINT) AS first_diff_index,
      true AS is_equal FROM lineitem"""))

  /** op 7 `compare`, diff path: perturb every row with l_orderkey % 1000 = 0
    * by +1 quantity; compare finds exactly those rows, positionally.
    */
  val compareDiff = Declared(
    "op_compare_diff",
    (s, dir) => {
      val sorted = t(s, dir, "lineitem").orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val perturbed = sorted.withColumn("l_quantity",
        when(col("l_orderkey") % 1000 === 0, col("l_quantity") + 1.0)
          .otherwise(col("l_quantity")))
      Compare.summarize(s, sorted, perturbed)
    },
    Some("""WITH indexed AS (
        SELECT l_orderkey,
          row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) - 1 AS idx
        FROM lineitem)
      SELECT
        (SELECT count(*) FROM lineitem) AS rows_left,
        (SELECT count(*) FROM lineitem) AS rows_right,
        count(*) AS n_diffs,
        min(idx) AS first_diff_index,
        false AS is_equal
      FROM indexed WHERE l_orderkey % 1000 = 0"""))

  /** op 7 `compare`, epsilon path: +0.005 on a double column is invisible at
    * eps=0.01 but not at eps=0 → is_equal true with epsilon.
    */
  val compareEpsilon = Declared(
    "op_compare_epsilon",
    (s, dir) => {
      val sorted = t(s, dir, "lineitem").orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val nudged = sorted.withColumn("l_quantity", col("l_quantity") + 0.005)
      Compare.summarize(s, sorted, nudged, epsilon = 0.01)
    },
    Some("""SELECT count(*) AS rows_left, count(*) AS rows_right,
      CAST(0 AS BIGINT) AS n_diffs, CAST(NULL AS BIGINT) AS first_diff_index,
      true AS is_equal FROM lineitem"""))

  /** op 6 `view-parquet-meta`: footer stats vs DuckDB parquet_metadata().
    * The oracle path is the fixed t2-verify scale factor (sf0.01).
    */
  val parquetMeta = Declared(
    "op_parquet_meta",
    (s, dir) =>
      ParquetMeta.metadata(s, s"$dir/lineitem.parquet")
        .orderBy(col("row_group_id"), col("column_id")),
    Some("""SELECT row_group_id, row_group_num_rows, column_id, path_in_schema,
      type, num_values, stats_null_count, stats_min_value, stats_max_value,
      compression
      FROM parquet_metadata('/root/testdata/sf0.01/lineitem.parquet')
      ORDER BY row_group_id, column_id"""))

  /** CSV source path: parquet → headered CSV (convert) → inferred-schema CSV
    * read → join+agg. Int/string columns only, so the text round trip is
    * exact and the oracle can stay on the original tables.
    */
  val csvRoundtrip = Declared(
    "op_csv_roundtrip",
    (s, dir) => {
      val out = "/tmp/graft_convert/nation_csv.csv"
      Convert.convert(s, s"$dir/nation.parquet", out, singleFile = true)
      val nation = graft.sources.Formats.read(s, out)
      val region = t(s, dir, "region")
      nation.join(region, nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_nation"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** NDJSON source path, same shape (reference JSON = newline-delimited). */
  val jsonRoundtrip = Declared(
    "op_json_roundtrip",
    (s, dir) => {
      val out = "/tmp/graft_convert/supplier_json.json"
      Convert.convert(s, s"$dir/supplier.parquet", out, singleFile = true)
      graft.sources.Formats.read(s, out)
        // JSON schema inference widens integers to bigint; restore the
        // source's int32 for schema parity with the oracle
        .withColumn("s_nationkey", col("s_nationkey").cast("int"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("total_bal"))
        .orderBy(col("s_nationkey"))
    },
    Some("""SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS total_bal
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))

  /** Keyed (order-free) compare: orders vs orders with every 500th row's
    * price perturbed and two rows dropped — categorized diff counts.
    */
  val compareKeyed = Declared(
    "op_compare_keyed",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val perturbed = o
        .filter(col("o_orderkey") % 777 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 500 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      Compare.summarizeByKey(o, perturbed, Seq("o_orderkey"))
    },
    Some("""SELECT
      CAST(sum(CASE WHEN o_orderkey % 777 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS only_left,
      CAST(0 AS BIGINT) AS only_right,
      CAST(sum(CASE WHEN o_orderkey % 777 <> 0 AND o_orderkey % 500 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS differing,
      CAST(sum(CASE WHEN o_orderkey % 777 <> 0 AND o_orderkey % 500 <> 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS equal_rows,
      false AS is_equal
      FROM orders"""))

  val all: Seq[Declared] = Seq(
    view, schemaQ, countQ, convertRoundtrip, csvRoundtrip, jsonRoundtrip,
    compareEqual, compareDiff, compareEpsilon, compareKeyed, parquetMeta)
}
