package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic genomic inputs derived from the TPC-H-ish
  * test tables, so every genomic operator can be validated against a
  * DuckDB oracle over the same parquet files.
  *
  * The derivation uses only integer arithmetic, CASE, substr and concat —
  * constructs with identical semantics in Spark SQL and DuckDB — and each
  * fragment exists exactly once here, used by BOTH engines (Spark via
  * `selectExpr`, DuckDB via a CTE in the oracle SQL). Shapes mirror the
  * reference's CF2 inputs (`convert/CommonFormat2Line.java:8-33`) and
  * gene/feature dims (`GeneCache.java:25-46`).
  */
object Synthetic {

  /** chromosome 1..20, X, Y from an integer key (mirrors rat karyotype,
    * reference `VcfToCommonFormat2Base.java:30-35` valid-chr handling). */
  private def chrExpr(k: String): String =
    s"""CASE ($k % 22)
       |  WHEN 20 THEN 'X'
       |  WHEN 21 THEN 'Y'
       |  ELSE CAST(($k % 22) + 1 AS STRING)
       |END""".stripMargin

  /** CF2-like variant lines derived from `lineitem`. Kinds: l_linenumber%5
    * == 0 -> insertion (empty ref), == 1 -> deletion (empty var), else SNV.
    * Depth fields emulate the AD/DP split (`CommonFormat2Line.java:25-33`).
    */
  val variantCols: Seq[(String, String)] = Seq(
    "vid" -> "l_orderkey * 10 + l_linenumber",
    "sample_id" -> "l_suppkey % 10",
    "gender" -> "CASE WHEN l_suppkey % 2 = 0 THEN 'M' ELSE 'F' END",
    "chromosome" -> chrExpr("l_orderkey"),
    "start_pos" -> "(l_partkey * 137 + l_linenumber * 31) % 3000000 + 1",
    "kind" -> "l_linenumber % 5",
    "ref_nuc" ->
      """CASE WHEN l_linenumber % 5 = 0 THEN ''
        |     WHEN l_linenumber % 5 = 1 THEN substr('ACGTACGT', CAST((l_partkey + l_linenumber) % 4 AS INT) + 1, CAST(2 + l_orderkey % 3 AS INT))
        |     ELSE substr('ACGT', CAST((l_partkey + l_linenumber) % 4 AS INT) + 1, 1)
        |END""".stripMargin,
    "var_nuc" ->
      """CASE WHEN l_linenumber % 5 = 0 THEN substr('ACGTACGT', CAST((l_partkey + l_linenumber) % 4 AS INT) + 1, CAST(2 + l_partkey % 3 AS INT))
        |     WHEN l_linenumber % 5 = 1 THEN ''
        |     ELSE substr('ACGT', CAST((l_partkey + l_linenumber + 1 + l_orderkey % 3) % 4 AS INT) + 1, 1)
        |END""".stripMargin,
    "count_a" -> "(l_partkey * 7 + l_linenumber) % 30",
    "count_c" -> "(l_suppkey * 3 + l_orderkey) % 30",
    "count_g" -> "(l_orderkey * 5 + l_partkey) % 30",
    "count_t" -> "(l_partkey + l_suppkey + l_linenumber * 11) % 30",
    "allele_depth" -> "(l_linenumber * 3 + l_partkey) % 40",
    "read_depth" -> "(l_linenumber * 3 + l_partkey) % 40 + (l_orderkey % 20)",
    "total_depth" -> "(l_partkey * 7 + l_linenumber) % 30 + (l_suppkey * 3 + l_orderkey) % 30 + (l_orderkey * 5 + l_partkey) % 30 + (l_partkey + l_suppkey + l_linenumber * 11) % 30")

  /** Gene-like intervals derived from `part` (mirrors the GENES/MAPS_DATA
    * dim, `GeneCache.java:29-34`). ~2.7 kb mean span. */
  val geneCols: Seq[(String, String)] = Seq(
    "gene_id" -> "p_partkey",
    "g_chr" -> chrExpr("p_partkey"),
    "g_start" -> "(p_partkey * 211) % 3000000 + 1",
    "g_stop" -> "(p_partkey * 211) % 3000000 + 1 + 200 + (p_size * 97) % 5000")

  private def selectList(cols: Seq[(String, String)]): String =
    cols.map { case (n, e) => s"($e) AS $n" }.mkString(", ")

  /** DuckDB CTE text for the synthetic variants table. */
  def variantsSql: String = s"SELECT ${selectList(variantCols)} FROM lineitem"

  /** DuckDB CTE text for the synthetic genes table. */
  def genesSql: String = s"SELECT ${selectList(geneCols)} FROM part"

  /** Spark DataFrame of the synthetic variants (same fragments). */
  def variants(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr(variantCols.map { case (n, e) => s"($e) AS $n" }: _*)

  /** Spark DataFrame of the synthetic genes (same fragments). */
  def genes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
      .selectExpr(geneCols.map { case (n, e) => s"($e) AS $n" }: _*)
}
