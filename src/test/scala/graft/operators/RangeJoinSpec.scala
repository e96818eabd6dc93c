package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  private def randomData(nPoints: Int, nIntervals: Int, span: Long) = {
    val chrs = Seq("1", "2", "X")
    val points = (0 until nPoints).map { i =>
      (i.toLong, chrs(rnd.nextInt(3)), rnd.nextLong().abs % span)
    }
    val intervals = (0 until nIntervals).map { i =>
      val s = rnd.nextLong().abs % span
      (i.toLong, chrs(rnd.nextInt(3)), s, s + rnd.nextInt(200000))
    }
    (points, intervals)
  }

  test("binned point-in-interval join equals brute-force scan (random data)") {
    val (pts, ivs) = randomData(500, 80, 3000000L)
    val p = pts.toDF("pid", "chr", "pos")
    val iv = ivs.toDF("iid", "ichr", "istart", "istop")
    val got = RangeJoin.pointInInterval(p, iv, Seq("chr"), Seq("ichr"),
        "pos", "istart", "istop", binSize = 100000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (pid, pchr, pos) <- pts
      (iid, ichr, s, e) <- ivs
      if pchr == ichr && pos >= s && pos <= e
    } yield (pid, iid)).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "fixture should produce at least one overlap")
  }

  test("left-outer variant keeps every point exactly once when unmatched") {
    val (pts, ivs) = randomData(300, 40, 3000000L)
    val p = pts.toDF("pid", "chr", "pos")
    val iv = ivs.toDF("iid", "ichr", "istart", "istop")
    val joined = RangeJoin.pointInIntervalLeftOuter(p, iv, Seq("chr"), Seq("ichr"),
      "pos", "istart", "istop", binSize = 100000L)
    val matchedBrute = (for {
      (pid, pchr, pos) <- pts
      (iid, ichr, s, e) <- ivs
      if pchr == ichr && pos >= s && pos <= e
    } yield (pid, iid)).toSet
    val rows = joined.select($"pid", $"iid").collect()
    val gotMatched = rows.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotMatched == matchedBrute)
    // every unmatched point appears exactly once with null interval
    val unmatchedPids = pts.map(_._1).toSet -- matchedBrute.map(_._1)
    val gotUnmatched = rows.filter(_.isNullAt(1)).map(_.getLong(0))
    assert(gotUnmatched.toSet == unmatchedPids)
    assert(gotUnmatched.length == unmatchedPids.size, "no duplicate null rows")
  }

  test("left-semi variant emits each covered point exactly once") {
    val (pts, ivs) = randomData(500, 80, 3000000L)
    val p = pts.toDF("pid", "chr", "pos")
    val iv = ivs.toDF("iid", "ichr", "istart", "istop")
    val got = RangeJoin.pointInIntervalSemi(p, iv, Seq("chr"), Seq("ichr"),
        "pos", "istart", "istop", binSize = 100000L)
      .select("pid").collect().map(_.getLong(0)).toSeq
    val expect = pts.collect {
      case (pid, pchr, pos)
          if ivs.exists { case (_, ichr, s, e) => pchr == ichr && pos >= s && pos <= e } =>
        pid
    }
    assert(got.sorted == expect.sorted) // once each, no duplicate-match inflation
    assert(expect.nonEmpty)
  }

  test("interval-overlap join emits each overlapping pair exactly once") {
    val left = (0 until 120).map { i =>
      val s = rnd.nextLong().abs % 2000000L
      (i.toLong, "1", s, s + rnd.nextInt(300000))
    }
    val right = (0 until 120).map { i =>
      val s = rnd.nextLong().abs % 2000000L
      (i.toLong, "1", s, s + rnd.nextInt(300000))
    }
    val l = left.toDF("lid", "lchr", "ls", "le")
    val r = right.toDF("rid", "rchr", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, Seq("lchr"), Seq("rchr"),
        "ls", "le", "rs", "re", binSize = 100000L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    val expect = (for {
      (lid, _, ls, le) <- left
      (rid, _, rs, re) <- right
      if ls <= re && le >= rs
    } yield (lid, rid))
    assert(got.sorted.toSeq == expect.sorted.toSeq) // exact multiset: no dup emissions
  }
}
