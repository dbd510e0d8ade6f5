package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every judged operator, aggregated from the query modules. A duplicate
    * name would silently drop one of the two when collapsed into the
    * `queries` Map, so it is a hard error here.
    */
  lazy val declared: Seq[Declared] = {
    val ds = declaredModules
    val dups = ds.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate declared query names: ${dups.mkString(", ")}")
    ds
  }

  private def declaredModules: Seq[Declared] =
    _root_.graft.queries.Relational.all ++
      _root_.graft.queries.TpchQ.all ++
      _root_.graft.queries.Aggregates.all ++
      _root_.graft.queries.Windows.all ++
      _root_.graft.queries.SetOps.all ++
      _root_.graft.queries.SqlSurface.all ++
      _root_.graft.queries.Scalars.all ++
      _root_.graft.queries.EventsQ.all ++
      _root_.graft.queries.Ops.all ++
      _root_.graft.queries.DedupQ.all ++
      _root_.graft.queries.SimilarityQ.all ++
      _root_.graft.queries.TextQ.all ++
      _root_.graft.queries.ExtrasQ.all ++
      _root_.graft.queries.Coverage.all ++
      _root_.graft.queries.Coverage2.all ++
      _root_.graft.queries.Coverage3.all ++
      _root_.graft.queries.Physical.all ++
      _root_.graft.queries.PipelineQ.all ++
      _root_.graft.queries.GraphQ.all ++
      _root_.graft.queries.QualityQ.all ++
      _root_.graft.queries.RecQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.q1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops (weaker rows-only
    * check).
    */
  def oracleSql: Map[String, String] =
    declared.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
