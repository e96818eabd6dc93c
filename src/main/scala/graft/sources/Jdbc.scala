package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC edge of the engine — the reference's Oracle tables become a
  * thin boundary: Parquet inside, JDBC append/upsert at the very edge.
  *
  * Reference sinks replaced here:
  *  - `BatchSqlUpdate` inserts, 10k/50k per batch
  *    (`VariantProcessingBase.java:225-275`, `ConservationScoreLoader
  *    .java:152-183`) → [[append]] with `batchsize`.
  *  - verify-then-insert upserts (`VariantLoad3.saveVariants:479-589`)
  *    → anti-join against the existing keys *before* the sink
  *    ([[graft.streaming.StreamingOps.upsertBatch]], query q63), then
  *    [[append]] — the sink itself stays append-only and idempotent.
  *  - `UPDATE`-style fixups (the `fixup` package jobs) → [[stageForMerge]]: write
  *    the delta to a staging table and run one set-based `MERGE` on the
  *    database (one statement, transactional, no per-row round trips) —
  *    the Spark jdbc writer deliberately never issues row-wise UPDATEs.
  *
  * Gated end-to-end against embedded Derby (`jdbc:derby:` — bundled
  * with the Spark distribution) in query q105: append with 10k batches,
  * staging + one MERGE, partitioned read-back, DuckDB computing the
  * expected post-MERGE state from the same parquet inputs.
  */
object Jdbc {

  val DefaultBatchSize = 10000

  /** Append `df` to `table` in batches (the K2/K3/K8 sink).
    * `columnTypes` is the writer's `createTableColumnTypes` — used on
    * first-write table creation to pin string columns to VARCHAR(n)
    * instead of the dialect default (Derby's default is CLOB, which
    * cannot appear in comparisons). */
  def append(df: DataFrame, url: String, table: String,
             props: java.util.Properties = new java.util.Properties(),
             batchSize: Int = DefaultBatchSize,
             numPartitions: Option[Int] = None,
             columnTypes: Option[String] = None): Unit = {
    val base = df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
    val w0 = numPartitions.fold(base)(n => base.option("numPartitions", n))
    val w = columnTypes.fold(w0)(t => w0.option("createTableColumnTypes", t))
    w.jdbc(url, table, props)
  }

  /** Stage a delta DataFrame into `stagingTable` (overwrite) so the
    * caller can run one server-side `MERGE INTO target USING staging`
    * statement — the scalable replacement for the reference's row-wise
    * batch UPDATEs (K5). Returns the MERGE template to run. */
  def stageForMerge(df: DataFrame, url: String, stagingTable: String,
                    targetTable: String, keyCols: Seq[String],
                    setCols: Seq[String],
                    props: java.util.Properties = new java.util.Properties(),
                    columnTypes: Option[String] = None): String = {
    val w0 = df.write.mode(SaveMode.Overwrite)
      .option("batchsize", DefaultBatchSize)
    val w = columnTypes.fold(w0)(t => w0.option("createTableColumnTypes", t))
    w.jdbc(url, stagingTable, props)
    // double-quote column identifiers: the Spark JDBC writer creates
    // columns QUOTED (case-sensitive), so an unquoted reference would
    // be case-folded by the database and miss them
    def qi(id: String) = "\"" + id + "\""
    val on = keyCols.map(k => s"t.${qi(k)} = s.${qi(k)}").mkString(" AND ")
    // SET columns stay unqualified (SQL standard; Derby rejects a
    // target-alias prefix in the SET clause, Oracle accepts either)
    val set = setCols.map(c => s"${qi(c)} = s.${qi(c)}").mkString(", ")
    val cols = (keyCols ++ setCols).map(qi).mkString(", ")
    val vals = (keyCols ++ setCols).map(c => s"s.${qi(c)}").mkString(", ")
    s"""MERGE INTO $targetTable t USING $stagingTable s ON ($on)
       |WHEN MATCHED THEN UPDATE SET $set
       |WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)""".stripMargin
  }

  /** Create an index on (quoted) `cols` — MERGE/upsert keys must be
    * indexed or row-based engines fall back to a nested-loop match
    * (quadratic: measured on embedded Derby, a 60k x 60k un-indexed
    * MERGE runs for 20+ minutes; indexed it is seconds). The reference
    * schema's Oracle tables carry these indexes implicitly via their
    * PKs; a freshly created staging/target table here does not. */
  def createIndex(url: String, table: String, cols: Seq[String],
                  name: String,
                  props: java.util.Properties = new java.util.Properties()): Unit = {
    val colList = cols.map(c => "\"" + c + "\"").mkString(", ")
    execute(url, s"CREATE INDEX $name ON $table ($colList)", props)
    ()
  }

  /** Run one DML/DDL statement on the database; returns the affected-row
    * count (the MERGE executor for [[stageForMerge]]'s template). */
  def execute(url: String, sql: String,
              props: java.util.Properties = new java.util.Properties()): Int = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally conn.close()
  }

  /** Boot down one embedded-Derby database so its directory can be
    * deleted/recreated within the same JVM. A successful shutdown
    * SIGNALS via SQLException (state 08006) by Derby contract; a
    * database that was never booted throws too — both are fine. */
  def shutdownEmbeddedDerby(dbDir: String): Unit =
    try {
      java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir;shutdown=true")
      ()
    } catch { case _: java.sql.SQLException => () }

  /** Partition-pruned parallel read (the S6-S11 scan side): predicates
    * list makes one JDBC partition per predicate (the reference's
    * per-(map_key, chromosome) slicing, as reader parallelism). */
  def readPartitioned(spark: org.apache.spark.sql.SparkSession, url: String,
                      table: String, predicates: Seq[String],
                      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, predicates.toArray, props)
}
