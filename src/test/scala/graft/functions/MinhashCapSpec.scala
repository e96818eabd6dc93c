package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hot-bucket control semantics of [[MinhashPipeline.capBands]] that
  * the q121 hash gate can't isolate: copy families survive hot-bucket
  * splitting intact, non-identical boilerplate collisions generate no
  * candidates, cold buckets are untouched (grp = 0), and the per-group
  * cap bounds monster families deterministically. Frames are
  * hand-built signed docs (doc_id, hl, sig) so bucket membership is
  * exact by construction. */
class MinhashCapSpec extends SparkSpec {
  import spark.implicits._

  private val K = DedupConfig.K // 16

  /** Self-join candidate pair count of a capped band frame. */
  private def pairCount(capped: org.apache.spark.sql.DataFrame): Long =
    capped.as("a").join(capped.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.grp") === col("b.grp") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()

  // family A: 10 exact copies (identical hl AND sig — all four bands
  // collide); noise: 60 docs sharing ONLY band 0's signature rows with
  // A (the boilerplate band), distinct everywhere else
  private def corpus = {
    val famA = (0L until 10L).map(i =>
      (i, Seq(1L, 2L, 3L), Seq.fill(K)(7L)))
    val noise = (0L until 60L).map(i =>
      (100L + i, Seq(500L + i, 600L + i),
        Seq(7L, 7L, 7L, 7L) ++ Seq.fill(K - 4)(1000L + i)))
    (famA ++ noise).toDF("doc_id", "hl", "sig")
  }

  test("hot bucket splits by content fingerprint: copy family survives, boilerplate cut") {
    val capped = MinhashPipeline.capBands(corpus, 16)
    // band 0's bucket has 70 members (> cap) -> split; nothing is
    // DROPPED by splitting alone (every group is under the cap)
    assert(capped.count() == 10L * 4 + 60L * 4)
    // candidates: exactly the intra-family pairs — the 60 distinct
    // noise docs in the hot bucket contribute ZERO pairs
    assert(pairCount(capped) == 45L)
  }

  test("under-cap buckets are untouched (grp = 0, all pairs kept)") {
    val capped = MinhashPipeline.capBands(corpus, 1000)
    assert(capped.filter(col("grp") =!= 0L).count() == 0L)
    // band 0's 70-doc bucket is cold at cap=1000: all C(70,2) pairs
    assert(pairCount(capped) == 70L * 69 / 2)
  }

  test("per-group cap bounds a monster copy-family at the cap lowest doc_ids") {
    val monster = (0L until 20L).map(i =>
      (i, Seq(1L, 2L), Seq.fill(K)(9L))).toDF("doc_id", "hl", "sig")
    // make the bucket hot so the group path runs: 20 > cap = 16
    val capped = MinhashPipeline.capBands(monster, 16)
    val kept = capped.filter(col("bkey") % DedupConfig.Bands === 0)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == (0L until 16L).toSet, s"kept $kept")
    assert(pairCount(capped) == 16L * 15 / 2)
  }
}
