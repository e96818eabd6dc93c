package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** J16 `Fasta.patchIntervals` — re-expression of
  * `VariantPostProcessing.getProperChunk:1281-1300`. */
class PatchIntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def features = Seq(
    (1L, "chr1", 100L, 150L), // cross-chr row -> patched
    (2L, "chr2", 100L, 150L), // same-chr decoy only -> NOT patched
    (3L, "chr3", 100L, 150L), // no map rows -> NOT patched
    (4L, "chr4", 100L, 150L), // decoy AND cross row -> cross wins
    (5L, "chr5", 200L, 250L)  // cross row at DIFFERENT start -> NOT patched
  ).toDF("tid", "chr", "start", "stop")

  private def mapData = Seq(
    (1L, "chr9", 100L, 160L),
    (2L, "chr2", 100L, 110L),
    (4L, "chr4", 100L, 110L),
    (4L, "chr8", 100L, 170L),
    (5L, "chr9", 300L, 350L)
  ).toDF("tid", "m_chr", "m_start", "m_stop")

  test("cross-chr same-start rows patch; decoys and start-mismatches don't") {
    val out = Fasta.patchIntervals(features, mapData, "tid")
      .select("tid", "patched", "src_chr", "src_start", "src_stop")
      .as[(Long, Boolean, String, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      (1L, true, "chr9", 100L, 160L),
      (2L, false, "chr2", 100L, 150L),
      (3L, false, "chr3", 100L, 150L),
      (4L, true, "chr8", 100L, 170L),
      (5L, false, "chr5", 200L, 250L)))
  }

  test("several cross-chr candidates: deterministic (m_chr, m_stop)-min wins") {
    val multi = mapData.unionByName(
      Seq((1L, "chr7", 100L, 155L), (1L, "chr7", 100L, 152L))
        .toDF("tid", "m_chr", "m_start", "m_stop"))
    val row = Fasta.patchIntervals(features, multi, "tid")
      .filter(col("tid") === 1L)
      .select("src_chr", "src_stop").as[(String, Long)].head()
    assert(row === (("chr7", 152L)))
  }

  test("shared lineage between features and mapData still joins correctly") {
    val base = features
    val derivedMaps = base.filter(col("tid") === 1L)
      .select(col("tid"), lit("chr9").as("m_chr"),
        col("start").as("m_start"), (col("stop") + 10L).as("m_stop"))
    val out = Fasta.patchIntervals(base, derivedMaps, "tid")
    assert(out.count() === 5L)
    assert(out.filter(col("patched")).select("tid").as[Long].collect() === Array(1L))
  }
}
