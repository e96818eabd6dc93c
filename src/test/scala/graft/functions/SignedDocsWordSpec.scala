package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral contract of [[MinhashPipeline.signedDocsWord]] — the
  * word-bigram front end q108 (uncapped baseline) and q127 (hot-bucket
  * production path) both sign with. The q127/q108 hash gates prove the
  * engine matches its DuckDB mirror end-to-end; this spec pins the
  * granularity semantics a refactor could silently change without
  * moving either gate (e.g. a tokenizer tweak that keeps exact copies
  * colliding but shifts what counts as "near"). */
class SignedDocsWordSpec extends SparkSpec {
  import spark.implicits._

  private def sign(rows: (Long, String)*) =
    MinhashPipeline.signedDocsWord(rows.toDF("doc_id", "text"))

  private def hlOf(rows: (Long, String)*): Map[Long, Seq[Long]] =
    sign(rows: _*).select("doc_id", "hl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  test("exact copies sign identically; case and leading/trailing space don't matter") {
    val m = hlOf(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delta",
      3L -> "  Alpha BETA gamma DELTA ")
    assert(m(1L) == m(2L))
    assert(m(1L) == m(3L))
    // and the full signatures collide on every band -> all-band
    // candidate pair (what the dedup family relies on)
    val sigs = sign(1L -> "alpha beta gamma delta",
        2L -> "alpha beta gamma delta")
      .select("sig").collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
  }

  test("granularity is the word BIGRAM: reordered words share only surviving adjacencies") {
    // same token multiset, one rotation: "alpha beta" and "beta gamma"
    // survive in neither order except "beta gamma"
    val m = hlOf(1L -> "alpha beta gamma", 2L -> "beta gamma alpha")
    assert(m(1L).size == 2 && m(2L).size == 2)
    assert(m(1L).intersect(m(2L)).size == 1) // exactly "beta gamma"
    // char n-grams would score these near-identical; word bigrams
    // correctly see Jaccard 1/3
  }

  test("hl is sorted and distinct; repeated bigrams collapse") {
    val m = hlOf(1L -> "x y x y x")
    // bigrams: "x y","y x","x y","y x" -> 2 distinct
    assert(m(1L).size == 2)
    assert(m(1L) == m(1L).sorted)
  }

  test("single-token and empty docs produce no signature row") {
    val out = sign(1L -> "loneword", 2L -> "", 3L -> "two tokens")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L))
  }

  test("composes with bandKeysOf + capBands: a copy family in a hot bucket survives intact") {
    // 20 exact copies + 30 distinct docs that share NO bigrams with
    // them: band the signed frame, cap at 16 — the copy family still
    // produces all C(20,2) intra-family candidate pairs iff capBands
    // groups by content fingerprint (not signature hash) before
    // capping... with cap 16 the family itself is capped to 16 docs.
    val copies = (0L until 20L).map(i => i -> "the quick brown fox jumps")
    val noise = (100L until 130L).map(i => i -> s"unique${i}a unique${i}b unique${i}c")
    val sig = sign(copies ++ noise: _*)
    val capped = MinhashPipeline.capBands(sig, 16)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.grp") === col("b.grp") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
    // capped to the 16 lowest doc_ids of the family, every band: the
    // pair set is exactly C(16,2) intra-family pairs, zero noise pairs
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 0L until 16L; b <- 0L until 16L if a < b
    } yield (a, b)).toSet
    assert(got == want)
  }
}
