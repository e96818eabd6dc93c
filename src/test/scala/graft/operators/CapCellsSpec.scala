package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hot-cell control semantics of [[IvfKmeans.capCells]] that the q131
  * hash gate can't isolate: the hot line is `max(cap, 1.5 × mean
  * occupancy)` (q128's drift-trigger constant), copy families survive
  * hot-cell splitting intact and bounded, distinct vectors in a hot
  * cell pair with nothing, and COLD cells are untouched even when they
  * exceed `cap` (the cap is a hot-cell bound, not a global truncation
  * — the divergence from capBands, where cold buckets are under cap by
  * definition). Frames are hand-built spill rows (vec_id, qv, cell) so
  * cell membership is exact by construction. */
class CapCellsSpec extends SparkSpec {
  import spark.implicits._

  private def pairCount(capped: org.apache.spark.sql.DataFrame): Long =
    capped.as("a").join(capped.as("b"),
        col("a.cell") === col("b.cell") && col("a.grp") === col("b.grp") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct().count()

  // cell 1: FLOOD — 40 exact copies (identical qv) + 20 distinct
  // vectors; cell 2: 20 distinct vectors (cold). total 80 rows over
  // k=8 notional cells -> mean 10, 1.5x mean = 15; hthr = max(cap,15).
  private def spill = {
    val flood = (0L until 40L).map(i => (i, Seq(5L, 5L, 5L), 1))
    val hotBg = (0L until 20L).map(i => (100L + i, Seq(i, i + 1L, i + 2L), 1))
    val cold = (0L until 20L).map(i => (200L + i, Seq(i, 9L, 9L), 2))
    (flood ++ hotBg ++ cold).toDF("vec_id", "qv", "cell")
  }

  test("hot cell splits by qv fingerprint: flood co-grouped and capped, background cut") {
    val capped = IvfKmeans.capCells(spill, k = 8, cap = 16)
    // cell 1 (60 > hthr 16) is hot: flood keeps its 16 lowest vec_ids,
    // the 20 distinct background rows become singleton groups (kept as
    // rows, generating no pairs); cell 2 (20 > cap but <= ... no: 20 >
    // hthr 16 -> ALSO hot at this cap; see the cold test for the mean
    // line) — here both cells are hot, so cell 2's 20 distinct rows
    // are singletons too
    assert(capped.filter(col("cell") === 1 && col("grp") =!= 0L).count() == 16L + 20L)
    assert(pairCount(capped) == 120L) // C(16,2) flood pairs only
  }

  test("the 1.5x-mean line keeps ordinary cells cold even above cap") {
    // cap 4 but mean occupancy 10 -> hthr = max(4, 15) = 15: cell 2
    // (20 rows) exceeds cap yet... 20 > 15 -> hot. Shrink cell 2 to
    // 12 rows: 12 <= 15 -> COLD, all C(12,2) pairs survive uncapped.
    val cold12 = spill.filter(col("cell") === 1)
      .unionByName((0L until 12L).map(i => (200L + i, Seq(i, 9L, 9L), 2))
        .toDF("vec_id", "qv", "cell"))
    // total 72 rows, mean 9, 1.5x = 13 (72*3 DIV 16); hthr = max(4,13)
    val capped = IvfKmeans.capCells(cold12, k = 8, cap = 4)
    val cell2 = capped.filter(col("cell") === 2)
    assert(cell2.count() == 12L) // no truncation of a cold cell
    assert(cell2.filter(col("grp") =!= 0L).count() == 0L)
    // hot cell 1: flood capped at the 4 LOWEST vec_ids (deterministic)
    assert(capped.filter(col("cell") === 1 && col("vec_id") < 100L)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("capped pairs survive for planted copies under a flood (q131's contract)") {
    // two-member copy family (ids 300, 301, identical qv) sharing the
    // hot cell with the flood: distinct fingerprint -> own group ->
    // its pair survives the split
    val withPlanted = spill.unionByName(
      Seq((300L, Seq(77L, 78L, 79L), 1), (301L, Seq(77L, 78L, 79L), 1))
        .toDF("vec_id", "qv", "cell"))
    val capped = IvfKmeans.capCells(withPlanted, k = 8, cap = 16)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.cell") === col("b.cell") && col("a.grp") === col("b.grp") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    assert(pairs.filter(col("va") === 300L && col("vb") === 301L).count() == 1L)
  }
}
