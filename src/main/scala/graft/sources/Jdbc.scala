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
  * No database exists in this environment, so these are exercised
  * through their parquet-mode equivalents in Verify; the option plumbing
  * below is the standard `DataFrameWriter.jdbc` surface.
  */
object Jdbc {

  val DefaultBatchSize = 10000

  /** Append `df` to `table` in batches (the K2/K3/K8 sink). */
  def append(df: DataFrame, url: String, table: String,
             props: java.util.Properties = new java.util.Properties(),
             batchSize: Int = DefaultBatchSize,
             numPartitions: Option[Int] = None): Unit = {
    val base = df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
    val w = numPartitions.fold(base)(n => base.option("numPartitions", n))
    w.jdbc(url, table, props)
  }

  /** Stage a delta DataFrame into `stagingTable` (overwrite) so the
    * caller can run one server-side `MERGE INTO target USING staging`
    * statement — the scalable replacement for the reference's row-wise
    * batch UPDATEs (K5). Returns the MERGE template to run. */
  def stageForMerge(df: DataFrame, url: String, stagingTable: String,
                    targetTable: String, keyCols: Seq[String],
                    setCols: Seq[String],
                    props: java.util.Properties = new java.util.Properties()): String = {
    df.write.mode(SaveMode.Overwrite)
      .option("batchsize", DefaultBatchSize)
      .jdbc(url, stagingTable, props)
    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val set = setCols.map(c => s"t.$c = s.$c").mkString(", ")
    val cols = (keyCols ++ setCols).mkString(", ")
    val vals = (keyCols ++ setCols).map(c => s"s.$c").mkString(", ")
    s"""MERGE INTO $targetTable t USING $stagingTable s ON ($on)
       |WHEN MATCHED THEN UPDATE SET $set
       |WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)""".stripMargin
  }

  /** Partition-pruned parallel read (the S6-S11 scan side): predicates
    * list makes one JDBC partition per predicate (the reference's
    * per-(map_key, chromosome) slicing, as reader parallelism). */
  def readPartitioned(spark: org.apache.spark.sql.SparkSession, url: String,
                      table: String, predicates: Seq[String],
                      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, predicates.toArray, props)
}
