package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged operator: a named Spark query over the fixture tables plus an
  * optional DuckDB-dialect oracle SQL producing the identical result (same
  * column NAMES — the driver sorts columns by name before hashing — and the
  * same deterministic row order).
  *
  * Oracle conventions (SURVEY §7.3 "dialect drift"):
  *  - every query ends in a total ORDER BY (unique key tiebreak);
  *  - nullable sort keys say NULLS FIRST explicitly (DuckDB defaults differ);
  *  - double aggregates are round()ed so summation order can't flip a hash;
  *  - integer sums are CAST(... AS BIGINT) in DuckDB (its sum(int) is HUGEINT).
  */
final case class Declared(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
