package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `SetSimJoin.prefixFilterJoin` — the large-universe exact-Jaccard
  * regime. Correctness = exact equivalence with the brute-force
  * all-pairs join at every threshold (the prefix filter may only prune
  * pairs that provably cannot reach the threshold). */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  // 8 sets with engineered overlap structure: exact dup (1,2), high
  // overlap (3,4), disjoint (5), subset (6 ⊂ 1), singleton (7),
  // empty (8, must be dropped)
  private def sets = Seq(
    (1L, Seq("a", "b", "c", "d", "e")),
    (2L, Seq("a", "b", "c", "d", "e")),
    (3L, Seq("a", "b", "c", "d", "x")),
    (4L, Seq("a", "b", "c", "y", "x")),
    (5L, Seq("p", "q", "r")),
    (6L, Seq("a", "b", "c")),
    (7L, Seq("z")),
    (8L, Seq.empty[String])
  ).toDF("id", "sh")

  private def brute(threshX1000: Int): Set[(Long, Long, Long)] = {
    val rows = sets.filter(size(col("sh")) > 0)
      .as[(Long, Seq[String])].collect()
    (for {
      (a, sa) <- rows; (b, sb) <- rows if a < b
      i = sa.toSet.intersect(sb.toSet).size.toLong
      u = sa.toSet.union(sb.toSet).size.toLong
      j = i * 1000 / u if j >= threshX1000
    } yield (a, b, j)).toSet
  }

  private def run(threshX1000: Int): Set[(Long, Long, Long)] =
    SetSimJoin.prefixFilterJoin(sets, "id", "sh", threshX1000)
      .as[(Long, Long, Long)].collect().toSet

  test("equivalent to brute force at thresholds 300/500/700/1000") {
    for (t <- Seq(300, 500, 700, 1000)) {
      assert(run(t) === brute(t), s"threshold $t")
    }
  }

  test("exact duplicates found at threshold 1000 (prefix length 1)") {
    assert(run(1000).contains((1L, 2L, 1000L)))
  }

  test("empty sets are dropped, never joined") {
    assert(!run(1).exists(p => p._1 == 8L || p._2 == 8L))
  }
}
