package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared gate plumbing: the staged unique-vid variant fixture and the
  * small filesystem/predicate helpers the file-backed gates all need.
  * Centralised so each new gate stops re-growing its own copy (the
  * r6 verdict counted four `rmrf` clones) and so the corpus-wide
  * `groupBy(vid)` dedup shuffle behind the q105/q106 fixtures runs
  * once per JVM instead of once per gate.
  */
object Fixtures {

  /** Root for every gate-owned scratch tree (file-format fixtures,
    * streaming checkpoints, bucketed index tables). Env-overridable so
    * the catalog is runnable from any checkout; the default matches
    * the driver harness layout. The ONLY absolute paths in src/main
    * live here — gates derive from these two roots. */
  val scratchRoot: String =
    sys.env.getOrElse("GRAFT_SCRATCH_ROOT", "/root/repo/tmp")

  /** Root of the driver-generated parquet test tables (TESTDATA.md). */
  val testdataRoot: String =
    sys.env.getOrElse("GRAFT_TESTDATA_ROOT", "/root/testdata")

  /** Committed measurement artifacts (r17, VERDICT r16 item 2): the
    * bench's stdout line carries suite totals only (per-query maps
    * overflowed the driver's tail capture in r5/r6), so per-query
    * minima were invisible to round-over-round comparison —
    * `PERF_rN.json` came back with `per_query: {}` every round. The
    * bench now ALSO copies its detail JSON here, at a fixed
    * per-core-count path, so the committed repo carries the per-query
    * numbers each round. */
  val artifactsRoot: String =
    sys.env.getOrElse("GRAFT_ARTIFACTS_ROOT", "/root/repo/artifacts")

  /** Recursive delete (tiny local fixture trees only — the gates own
    * everything under `QueriesSources.FixtureDir`). */
  def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete()
  }

  /** JDBC partition predicates `MOD("c", n) = 0 .. n-1` — a full,
    * disjoint cover of the table so a partitioned read is exactly one
    * scan. Quoted: the Spark JDBC writer creates case-sensitive
    * lowercase columns on Derby. */
  def modPredicates(column: String, n: Int): Seq[String] =
    (0 until n).map(i => s"""MOD("$column", $n) = $i""")

  private val stagedDedup = new ConcurrentHashMap[String, String]()

  /** The unique-vid variant base both database-shaped gates build on
    * (vid repeats in the synthetic corpus; anything addressing rows by
    * id — the MERGE keys of q105, the fixup ids of q106 — needs the
    * deterministic min-per-vid reduction first). The corpus-wide
    * `groupBy(vid)` shuffle is the expensive part, so the result is
    * staged to parquet once per (JVM, sf-dir) and every later consumer
    * pays a parquet scan instead of a repeat shuffle. Columns:
    * vid, sample_id, chromosome, start_pos, ref_nuc, var_nuc,
    * total_depth (all min-reduced).
    */
  def dedupVariants(spark: SparkSession, dir: String): DataFrame = {
    val path = stagedDedup.computeIfAbsent(dir, { d =>
      val p = s"${QueriesSources.FixtureDir}/dedup_variants_" +
        d.replaceAll("[^A-Za-z0-9.]", "_")
      Synthetic.variants(spark, d)
        .groupBy(col("vid"))
        .agg(min(col("sample_id")).as("sample_id"),
          min(col("chromosome")).as("chromosome"),
          min(col("start_pos")).as("start_pos"),
          min(col("ref_nuc")).as("ref_nuc"),
          min(col("var_nuc")).as("var_nuc"),
          min(col("total_depth")).as("total_depth"))
        .write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
  }
}
