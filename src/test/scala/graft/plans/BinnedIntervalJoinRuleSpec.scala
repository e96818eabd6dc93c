package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class BinnedIntervalJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(11)

  private def fixture = {
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextLong().abs % 5000000L))
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextLong().abs % 5000000L
      (i.toLong, s, s + rnd.nextInt(400000))
    }
    (pts, ivs)
  }

  test("rule rewrites a raw interval theta join into a hash join with identical results") {
    // the rule is installed session-wide via GraftExtensions (SparkSpec
    // builds every test session withExtensions), so a raw range theta
    // join — which the planner would otherwise run as a
    // BroadcastNestedLoopJoin — comes back binned and hash-joined with
    // no caller opt-in
    val (pts, ivs) = fixture
    val p = pts.toDF("pid", "pos")
    val iv = ivs.toDF("iid", "lo", "hi")

    val expect = (for {
      (pid, pos) <- pts
      (iid, lo, hi) <- ivs
      if pos >= lo && pos <= hi
    } yield (pid, iid)).sorted

    val rewritten = p.join(iv, $"pos" >= $"lo" && $"pos" <= $"hi")
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"still BNL:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    val got = rewritten.select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == expect)
    assert(expect.nonEmpty)
    // schema unchanged by the rewrite (bin column projected away)
    assert(rewritten.columns.toSeq == Seq("pid", "pos", "iid", "lo", "hi"))
  }

  test("rule leaves joins without a two-sided range pattern alone") {
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val b = Seq((1L, 5L), (2L, 30L)).toDF("k2", "w")
    // plain equi join
    val eq = a.join(b, $"k" === $"k2")
    assert(eq.count() == 2)
    // one-sided range (both bounds from the same side) — not the pattern
    val oneSided = a.join(b, $"v" >= $"w" && $"k" === $"k2")
    assert(oneSided.count() == 1)
  }

  test("rule skips joins that already have a cross-side equality (no double binning)") {
    val p = Seq((1L, 100L), (1L, 2500000L)).toDF("chr", "pos")
    val iv = Seq((1L, 50L, 200L), (1L, 2400000L, 2600000L)).toDF("ichr", "lo", "hi")
    val j = p.join(iv, $"chr" === $"ichr" && $"pos" >= $"lo" && $"pos" <= $"hi")
    // equality conjunct ⇒ planner hash-joins it already; the rule must
    // not add a Generate (which RangeJoin-built joins would get twice)
    assert(!j.queryExecution.optimizedPlan.toString.contains("explode"),
      j.queryExecution.optimizedPlan.toString)
    assert(j.count() == 2)
  }
}
