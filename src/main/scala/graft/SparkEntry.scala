package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full synthetic variant-load shape: derive CF2-like lines,
    * type/zygosity them, interval-join genic status, aggregate per
    * (chromosome, status) — the §7.2 minimum end-to-end slice. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.all.find(_.name == "q25_genic_status").get
      .fn(spark, s"${graft.queries.Fixtures.testdataRoot}/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
