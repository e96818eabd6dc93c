package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VariantFunctions

/** Fix-up jobs (SURVEY §5.5) — the reference's maintenance pattern: a
  * full-table scan that RE-DERIVES a stored column from its source
  * columns, counts rows already up to date, and batch-updates the rows
  * that drifted (`fixup/VariantTypeFixUp.java:37-88`,
  * `fixup/FrameShiftFixUp.java:36-87`; both stream the whole table
  * through one JDBC cursor and buffer 10k-row UPDATE batches).
  *
  * Spark-first shape: the re-derivation is a pure projection over the
  * stored table, drift is a null-safe inequality, the "update" is an
  * overwrite of the stored column — a map-only plan with no shuffle at
  * any scale; the drift REPORT is one aggregation. Asserting zero
  * drift after the fix is the reference's implicit convergence
  * property made explicit (a second fixup run updates nothing).
  */
object Fixup {

  /** Annotate `df` with `recomputed` (the re-derivation of
    * `storedCol`) and boolean `drifted` (null-safe inequality, so a
    * stored value vs an unknown-type null also counts as drift — the
    * reference updates those rows too). */
  def drift(df: DataFrame, storedCol: String, recomputed: Column): DataFrame =
    df.withColumn("recomputed", recomputed)
      .withColumn("drifted", !(col(storedCol) <=> col("recomputed")))

  /** The corrective update: stored column overwritten with the
    * re-derivation (the reference's batched
    * `UPDATE variant SET variant_type=? WHERE variant_id=?`). */
  def applyFix(df: DataFrame, storedCol: String, recomputed: Column): DataFrame =
    df.withColumn(storedCol, recomputed)

  /** VariantTypeFixUp over a VARIANT-shaped frame
    * (ref_nuc, var_nuc, variant_type). */
  def variantTypeDrift(variants: DataFrame): DataFrame =
    drift(variants, "variant_type",
      VariantFunctions.variantTypeFixup(col("ref_nuc"), col("var_nuc")))

  /** FrameShiftFixUp over a variant⋈variant_transcript-shaped frame
    * (ref_nuc, var_nuc, frameshift). */
  def frameshiftDrift(vt: DataFrame): DataFrame =
    drift(vt, "frameshift",
      VariantFunctions.frameshiftFlag(col("ref_nuc"), col("var_nuc")))
}
