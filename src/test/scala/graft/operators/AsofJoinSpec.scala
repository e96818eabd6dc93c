package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join equals brute-force most-recent-prior (random data)") {
    val rnd = new Random(5)
    val lefts = (0 until 300).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rights = (0 until 200).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, 100L + i))
    // one row per (key, ts) on the right → deterministic match
    val rdd = rights.groupBy(r => (r._1, r._2)).map { case ((k, ts), rs) =>
      (k, ts, rs.map(_._3).max)
    }.toSeq
    val l = lefts.toDF("k", "lts", "lid")
    val r = rdd.toDF("k", "rts", "pay")
    val got = AsofJoin.backward(l, r, Seq("k"), "lts", "rts", Seq("pay"))
      .collect().map(row => (row.getLong(2), Option(row.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    lefts.foreach { case (k, lts, lid) =>
      val expect = rdd.filter(x => x._1 == k && x._2 <= lts)
        .sortBy(x => x._2).lastOption.map(_._3)
      assert(got(lid) == expect, s"left $lid key $k ts $lts")
    }
    // every left row exactly once
    assert(got.size == lefts.size)
    assert(got.values.exists(_.nonEmpty) && got.values.exists(_.isEmpty))
  }

  test("equal timestamps: right row at the same ts is matched (inclusive)") {
    val l = Seq((1L, 10L, 1L)).toDF("k", "lts", "lid")
    val r = Seq((1L, 10L, 42L)).toDF("k", "rts", "pay")
    val row = AsofJoin.backward(l, r, Seq("k"), "lts", "rts", Seq("pay")).head()
    assert(row.getLong(3) == 42L)
  }
}
