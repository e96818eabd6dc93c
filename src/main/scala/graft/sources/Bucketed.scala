package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing for co-located joins.
  *
  * The reference's biggest repeated join is new-vs-existing variants on
  * the natural key (`VariantLoad3.saveVariants:483-532` — rebuilt as an
  * in-memory hash map per chromosome, capped by one JVM's heap). At
  * 100 TB the existing-variants side is far too large to broadcast and
  * re-shuffling it on every incremental load wave is the dominant cost:
  * both sides of every load-wave join pay a full shuffle.
  *
  * Bucketing is the standing answer: write the persistent table once,
  * hash-bucketed (and sorted) by the join key. Every subsequent join
  * against a table bucketed on the same key with the same bucket count
  * — or against a freshly shuffled small side — reads bucket files
  * whose partitioning Catalyst recognizes (`HashPartitioning` reported
  * by the scan), so the sort-merge join plans with NO Exchange on the
  * bucketed side(s): the shuffle is paid once at write time, amortized
  * over every future load wave. Bucket count sizes the parallelism:
  * pick `tableBytes / ~256 MB` at write time.
  *
  * `BucketedJoinSpec` asserts the zero-exchange plan.
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed and sorted by
    * `keys` — the once-per-table shuffle that makes all later joins on
    * `keys` exchange-free. Pass `path` to pin the table's files to an
    * external location (the catalog entry still carries the bucket
    * spec, which is what the planner reads). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], mode: String = "overwrite",
                    path: Option[String] = None): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Compact a bucketed table in place: rewrite it under a fresh
    * bucket spec, collapsing the one-file-set-per-append accumulation
    * back to one file set and (optionally) changing the bucket count.
    *
    * The maintenance job for append-grown index tables (q99/q109's
    * epoch commits, q91's streaming store): every `mode="append"`
    * write lands its own file set per bucket, so after E epochs each
    * bucket scan opens E files; and the bucket count itself is a
    * capacity parameter ([[graft.functions.DedupConfig.IndexBuckets]])
    * that the corpus eventually outgrows. One paid shuffle here
    * restores single-file buckets at the new parallelism, after which
    * every subsequent join on `keys` is exchange-free again —
    * identical rows, identical downstream plans. Run it at an epoch
    * barrier (q109) or between waves (q99/q91), where the table is
    * frozen by construction; the swap is a catalog rename, not a
    * read-blocking rewrite, on a real metastore.
    *
    * Implementation note: the table is snapshotted via localCheckpoint
    * (cutting lineage to the source files) before the drop+rewrite, so
    * the write never reads files it is replacing. On a production
    * metastore the rewrite would stage under a sibling name and swap
    * with a catalog rename so readers never observe the gap; the
    * single-JVM gate form trades that for one write. */
  def compact(spark: org.apache.spark.sql.SparkSession, table: String,
              buckets: Int, keys: Seq[String],
              path: Option[String] = None): Unit = {
    val snapshot = spark.table(table).localCheckpoint(true)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    writeBucketed(snapshot, table, buckets, keys, path = path)
    path.foreach(spark.catalog.refreshByPath)
    snapshot.unpersist()
  }
}
