package graft.queries

import graft.{Declared, Tables}
import graft.functions.Similarity
import org.apache.spark.sql.functions._

/** Second coverage batch: IVF-style ANN, regression aggregates, the
  * remaining scalar-function rows, schema-based JSON parsing.
  */
object Coverage2 {
  import Tables.t

  /** IVF-flavored ANN: coarse cells = per-label centroids (computed in-query
    * — at scale they'd be a precomputed table), query probes its nearest
    * cell only, exact cosine within. Fully deterministic, so unlike the LSH
    * variant this one is oracle-checked end-to-end.
    */
  val simIvf = Declared(
    "sim_ivf",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val centroids = e
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("col").cast("double")).as("v"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("label").as("c_label"), expr("transform(pv, x -> x.v)").as("centroid"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val nearest = centroids.crossJoin(broadcast(q))
        // centroid is array<double> (avg-built) vs float query vector: mixed
        // types take the HOF path; the codegen CosineSim is float×float only
        .select(col("c_label"), Similarity.cosineHof(col("centroid"), col("qv")).as("ccos"))
        .orderBy(col("ccos").desc, col("c_label"))
        .limit(1)
      e.join(broadcast(nearest), e("label") === nearest("c_label"))
        .crossJoin(broadcast(q))
        .select(
          col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    Some("""WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
      cells AS (
        SELECT label, list(v ORDER BY i) AS centroid FROM (
          SELECT label, CAST(i AS INTEGER) AS i,
                 avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS v
          FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
          GROUP BY label, CAST(i AS INTEGER))
        GROUP BY label),
      nearest AS (
        SELECT label AS c_label
        FROM cells CROSS JOIN q
        ORDER BY list_cosine_similarity(centroid, q.qv) DESC, label LIMIT 1)
      SELECT vec_id, label,
        round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) + 0.0 AS cos
      FROM embeddings JOIN nearest ON label = c_label CROSS JOIN q
      ORDER BY cos DESC, vec_id LIMIT 10"""))

  /** The at-scale IVF shape sim_ivf's doc promises: centroids MATERIALIZED
    * once as a parquet table (the precomputed coarse index — built offline at
    * 100 TB, not in-query), then multi-probe: the query visits its nearest
    * TWO cells, which recovers neighbors that straddle a cell boundary — the
    * classic IVF recall fix at the cost of scanning 2/N of the corpus instead
    * of 1/N. Exact cosine within the probed cells, so still fully
    * oracle-checked.
    */
  val simIvfProbe2 = Declared(
    "sim_ivf_probe2",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val tmp = graft.Tables.scratch("ivf")
      e.select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("col").cast("double")).as("v"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("label").as("c_label"), expr("transform(pv, x -> x.v)").as("centroid"))
        .write.mode("overwrite").parquet(s"$tmp/centroids.parquet")
      val centroids = s.read.parquet(s"$tmp/centroids.parquet")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val near2 = centroids.crossJoin(broadcast(q))
        .select(col("c_label"), Similarity.cosineHof(col("centroid"), col("qv")).as("ccos"))
        .orderBy(col("ccos").desc, col("c_label"))
        .limit(2)
      e.join(broadcast(near2), e("label") === near2("c_label"))
        .crossJoin(broadcast(q))
        .select(
          col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    Some("""WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
      cells AS (
        SELECT label, list(v ORDER BY i) AS centroid FROM (
          SELECT label, CAST(i AS INTEGER) AS i,
                 avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS v
          FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
          GROUP BY label, CAST(i AS INTEGER))
        GROUP BY label),
      nearest2 AS (
        SELECT label AS c_label
        FROM cells CROSS JOIN q
        ORDER BY list_cosine_similarity(centroid, q.qv) DESC, label LIMIT 2)
      SELECT vec_id, label,
        round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) + 0.0 AS cos
      FROM embeddings JOIN nearest2 ON label = c_label CROSS JOIN q
      ORDER BY cos DESC, vec_id LIMIT 10"""))

  /** Linear-regression aggregates (regr_*). */
  val regr = Declared(
    "q_agg_regr",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"),
          round(expr("regr_avgx(l_extendedprice, l_quantity)"), 4).as("avgx"),
          round(expr("regr_avgy(l_extendedprice, l_quantity)"), 4).as("avgy"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
      round(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0 AS intercept,
      round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
      round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
      round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Second string battery: btrim, chr, hex, sha2, bit/octet length. */
  val stringFuncs2 = Declared(
    "q_string_funcs2",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          expr("btrim(p_brand, 'Brand#')").as("brand_core"),
          expr("chr(65 + CAST(p_partkey % 26 AS INT))").as("letter"),
          hex(col("p_size").cast("long")).as("size_hex"),
          sha2(col("p_name"), 256).as("name_sha"),
          bit_length(col("p_brand")).as("brand_bits"),
          octet_length(col("p_name")).as("name_bytes"),
          concat_ws("|", col("p_brand"), col("p_type"), col("p_name")).as("joined"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      trim(p_brand, 'Brand#') AS brand_core,
      chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS letter,
      to_hex(p_size) AS size_hex,
      sha256(p_name) AS name_sha,
      CAST(bit_length(p_brand) AS INTEGER) AS brand_bits,
      CAST(octet_length(CAST(p_name AS BLOB)) AS INTEGER) AS name_bytes,
      p_brand || '|' || p_type || '|' || p_name AS joined
      FROM part WHERE p_partkey < 500 ORDER BY p_partkey"""))

  /** Second math battery: factorial, isnan/nan handling, pmod vs %. */
  val mathFuncs2 = Declared(
    "q_math_funcs2",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          factorial(col("l_linenumber")).as("ln_fact"),
          isnan(col("l_quantity") / col("l_quantity")).as("qq_isnan"),
          isnan(lit(Double.NaN)).as("nan_flag"), // DuckDB sqrt(-1) errors; a NaN literal is the portable probe
          pmod(col("l_orderkey") - lit(100), lit(7)).as("pmod7"),
          ((col("l_orderkey") - lit(100)) % lit(7)).as("rem7"),
          round(cbrt(col("l_extendedprice")), 6).as("price_cbrt"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ln_fact")),
    Some("""SELECT l_orderkey, l_linenumber,
      CAST(factorial(l_linenumber) AS BIGINT) AS ln_fact,
      isnan(l_quantity / l_quantity) AS qq_isnan,
      isnan(CAST('nan' AS DOUBLE)) AS nan_flag,
      CAST((((l_orderkey - 100) % 7) + 7) % 7 AS BIGINT) AS pmod7,
      (l_orderkey - 100) % 7 AS rem7,
      round(cbrt(l_extendedprice), 6) AS price_cbrt
      FROM lineitem WHERE l_orderkey < 200
      ORDER BY l_orderkey, l_linenumber, ln_fact"""))

  /** Schema-based JSON parsing (from_json → struct), vs get_json_object's
    * path extraction in q_json_extract.
    */
  val jsonSchema = Declared(
    "q_json_schema",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") < 500)
        .select(
          col("event_id"),
          expr("from_json(props, 'k INT')").getField("k").as("k"),
          (expr("from_json(props, 'k INT')").getField("k") % 10).as("k_mod"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
      CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
      CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) % 10 AS k_mod
      FROM events WHERE event_id < 500 ORDER BY event_id"""))

  /** typeof introspection (the reference exposes DataFusion's arrow_typeof).
    * Restricted to the type names Spark and DuckDB spell identically
    * (bigint/double); the full cross-engine mapping lives in SchemaOp.
    */
  val typeofQ = Declared(
    "q_typeof",
    (s, dir) =>
      t(s, dir, "lineitem")
        .limit(1)
        .select(
          lower(expr("typeof(l_orderkey)")).as("t_key"),
          lower(expr("typeof(l_quantity)")).as("t_qty")),
    Some("""SELECT lower(typeof(l_orderkey)) AS t_key,
      lower(typeof(l_quantity)) AS t_qty
      FROM lineitem LIMIT 1"""))

  val all: Seq[Declared] = Seq(
    simIvf, simIvfProbe2, regr, stringFuncs2, mathFuncs2, jsonSchema, typeofQ)
}
