package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VariantFunctions, ZygosityFunctions}

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

  /** GenicStatusFixUp (`fixup/GenicStatusFixUp.java:103-109`): a
    * variant is "genic" iff any gene interval contains its position —
    * the one fixup whose re-derivation is NOT a projection but an
    * interval join (the reference issues one indexed range query per
    * row; here it's one binned broadcast join + a per-id aggregation,
    * the q25 shape). `variants` must carry unique `vid`,
    * `chromosome`, `start_pos`, `genic_status`; `genes` is the
    * (g_chr, g_start, g_stop) dim. Compare is effectively the
    * reference's case-insensitive one (both sides lowercase). */
  def genicStatusDrift(variants: DataFrame, genes: DataFrame): DataFrame = {
    // r16 (guide §2.4 remove shuffles outright): the re-derivation is
    // an EXISTENCE test, so gene identity is irrelevant — merge
    // overlapping gene intervals per chromosome first (two windows +
    // one aggregation on the DIM side, which broadcasts anyway). The
    // merged set is disjoint, so the binned broadcast join emits
    // exactly one row per variant row and the former per-vid
    // aggregation + join-back — TWO full-corpus exchanges per call,
    // and q106 calls this three times — disappear: the whole
    // re-derivation is now map-side against the broadcast. Identical
    // result under the existing unique-vid contract (coverage is
    // preserved exactly by the merge; FixupDriftSpec pins equivalence on
    // overlapping/nested/duplicate-coverage fixtures).
    val merged = RangeJoin.mergeIntervals(
      genes.select(col("g_chr"), col("g_start"), col("g_stop")),
      Seq("g_chr"), "g_start", "g_stop")
    RangeJoin.pointInIntervalLeftOuter(
        variants, merged, Seq("chromosome"), Seq("g_chr"), "start_pos",
        "g_start", "g_stop", binSize = 100000L, broadcastIntervals = true)
      .withColumn("recomputed",
        when(col("g_start").isNotNull, "genic").otherwise("intergenic"))
      .withColumn("drifted", !(col("genic_status") <=> col("recomputed")))
      .drop("g_chr", "g_start", "g_stop")
  }

  /** NumAllelesFixUp (`fixup/NumAllelesFixUp.java:46-99`): among rows
    * with percent-read > 0, the allele count at one (sample, chr, pos)
    * site is the site's row count, plus one if any row there saw the
    * reference allele. One window aggregation — the shuffle is the
    * reference's ORDER BY sample,chromosome,start_pos cursor, keyed
    * identically. Scoped to percent-read > 0 exactly as the job's
    * WHERE clause; out-of-scope rows are never touched. */
  def numAlleleDrift(variants: DataFrame): DataFrame = {
    val w = Window.partitionBy(
      col("sample_id"), col("chromosome"), col("start_pos"))
    variants.filter(col("zygosity_percent_read") > 0)
      .withColumn("recomputed",
        (count(lit(1)).over(w) +
          max(when(col("zygosity_ref_allele") === "Y", 1L).otherwise(0L)).over(w))
          .cast("int"))
      .withColumn("drifted", !(col("zygosity_num_allele") <=> col("recomputed")))
  }

  /** Join-free form of [[numAlleleDrift]]'s re-derivation, for callers
    * that want the recomputed allele count ATTACHED to every row of the
    * frame (in-scope rows get the site count, out-of-scope rows get
    * NULL) instead of a filtered drift report. One window over the
    * UNFILTERED frame replaces filter -> window -> join-back-on-vid —
    * r17 (guide §2.4 remove shuffles outright): q106 used the
    * join-back twice (fixture build and fix application), paying the
    * site-key exchange PLUS two vid exchanges per use; this is the
    * site-key exchange alone. Equivalence with
    * filter(percent>0) -> [[numAlleleDrift]] -> join on unique vid is
    * exact: the count counts only in-scope rows, the ref-allele bump
    * sees only in-scope rows, and out-of-scope rows (which the
    * filtered form never emits, so the join-back left NULL) get NULL
    * here. Pinned in FixupDriftSpec. */
  def numAlleleRecomputed: Column = {
    val w = Window.partitionBy(
      col("sample_id"), col("chromosome"), col("start_pos"))
    val inScope = col("zygosity_percent_read") > 0
    when(inScope,
      (count(when(inScope, 1)).over(w) +
        max(when(inScope && col("zygosity_ref_allele") === "Y", 1L)
          .otherwise(0L)).over(w)).cast("int"))
  }

  /** ZygosityPercReadFixUp scope (`fixup/ZygosityPercReadFixUp.java:53-54`):
    * SNV rows whose stored percent-read disagrees with var_freq — the
    * job rewrites percent := var_freq and re-derives the status. */
  def zygosityPercentScope(variants: DataFrame): DataFrame =
    variants.filter(col("variant_type") === "snv" &&
      !(col("zygosity_percent_read") <=> col("var_freq")))

  /** The gender-free status ladder that fixup uses
    * (`ZygosityPercReadFixUp.getZygosity:130-137` — unlike the loader's
    * `ZygosityFunctions.zygosityStatus`, no hemizygous branch). */
  def zygosityLadder(pct: Column): Column =
    when(pct === ZygosityFunctions.HomozygousPercent, ZygosityFunctions.Homozygous)
      .when(pct >= ZygosityFunctions.PossiblyHomozygousPercent,
        ZygosityFunctions.PossiblyHomozygous)
      .otherwise(ZygosityFunctions.Heterozygous)
}
