package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed parser for wiggle `fixedStep` files.
  *
  * The reference reads wig files with a single-threaded stateful loop:
  * a `fixedStep chrom=.. start=.. step=..` declaration line sets
  * (chr, pos, step) and each following data line emits one
  * (chr, pos, score) row and advances pos by step
  * (`ConservationScoreLoader.run()`, reference
  * `ConservationScoreLoader.java:94-141`).
  *
  * Distributed re-expression: the *declarations* are a tiny fraction of
  * the file (one per block of thousands of data lines). So:
  *   1. extract declarations and give each a validity interval
  *      [decl_line + 1, next_decl_line - 1] (one small window over the
  *      declarations only);
  *   2. interval-join the data lines back to their governing
  *      declaration on binned line-id ranges (same machinery as the
  *      genomic [[RangeJoin]] — an equi-join on bins, no global sort of
  *      the data lines);
  *   3. position = start + (line_id - decl_line - 1) * step.
  *
  * The only global ordering requirement is a dense `line_id` per input
  * line *within a block* (files read as (offset, line) pairs provide
  * this); data lines never shuffle through a single partition the way a
  * naive `last(decl) over (order by line_id)` window would force.
  */
object WigParser {

  private val DeclPrefix = "fixedStep"

  def isDeclaration(line: Column): Column = line.startsWith(DeclPrefix)

  /** Parse (line_id, line) rows into (chrom, pos, score) rows.
    *
    * @param lines   DataFrame with `line_id` (long, dense within each
    *                block, globally increasing) and `line` (string)
    * @param binSize bin width for the declaration-interval join; choose
    *                ~ the typical block length so each declaration
    *                explodes to a handful of bins
    */
  def parse(lines: DataFrame, binSize: Long = 1024L): DataFrame = {
    val decls = lines.filter(isDeclaration(col("line")))
      .select(
        col("line_id").as("decl_id"),
        regexp_extract(col("line"), "chrom=(\\S+)", 1).as("chrom"),
        regexp_extract(col("line"), "start=([0-9]+)", 1).cast("long").as("start"),
        regexp_extract(col("line"), "step=([0-9]+)", 1).cast("long").as("step"))
      // materialized once: the distributed lead's branches (max,
      // boundary frame, per-band lead) would otherwise each re-scan
      // the full text for this tiny filtered frame
      .localCheckpoint(true)
    // each declaration governs up to the line before the next one
    // (the final block is bounded by the max line id so its bin
    // explosion stays finite). Successor ids via the DISTRIBUTED lead
    // (DistributedLead.withNext): declarations scale with file
    // count/blocks, so no single-partition window even here
    val maxLine = lines.agg(max(col("line_id")).as("__max_line"))
    val spans = DistributedLead.withNext(decls, "decl_id", "next_id")
      .crossJoin(broadcast(maxLine))
      .withColumn("next_id", coalesce(col("next_id"), col("__max_line") + 1))
      .withColumn("lo", col("decl_id") + 1)
      .withColumn("hi", col("next_id") - 1)
      .drop("next_id", "__max_line")
    val values = lines.filter(!isDeclaration(col("line")))
    RangeJoin.pointInInterval(
        values, spans, Seq.empty, Seq.empty, "line_id", "lo", "hi",
        binSize = binSize, broadcastIntervals = true)
      .select(
        col("chrom"),
        (col("start") + (col("line_id") - col("decl_id") - 1) * col("step")).as("pos"),
        col("line").cast("long").as("score"))
  }
}
