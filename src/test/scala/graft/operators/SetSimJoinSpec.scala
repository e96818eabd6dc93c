package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap jaccard equals array-based jaccard on random sets") {
    val rnd = new Random(7)
    val universe = (0 until 150).map(i => f"g$i%03d")
    val docs = (0 until 60).map { id =>
      (id.toLong, rnd.shuffle(universe).take(20 + rnd.nextInt(80)).sorted)
    }
    val df = docs.toDF("doc_id", "sh")
    val bm = SetSimJoin.withBitmap(df, "doc_id", "sh")
      .select(col("doc_id"), col("sz"), col("bm"), col("sh"))
    val pairs = bm.as("a").join(bm.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        SetSimJoin.jaccardX1000(col("a.bm"), col("b.bm"), col("a.sz"), col("b.sz")).as("jbm"),
        expr("CAST((size(array_intersect(a.sh, b.sh)) * 1000) DIV size(array_union(a.sh, b.sh)) AS BIGINT)").as("jarr"))
    val bad = pairs.filter(col("jbm") =!= col("jarr")).count()
    assert(bad == 0)
    // sanity: some pair has a nonzero jaccard
    assert(pairs.filter(col("jbm") > 0).count() > 0)
  }

  test("interSize: identical sets give |A|, disjoint sets give 0") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c")),
      (3L, Seq("x", "y"))).toDF("doc_id", "sh")
    val bm = SetSimJoin.withBitmap(df, "doc_id", "sh")
    val m = bm.as("a").join(bm.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        SetSimJoin.interSize(col("a.bm"), col("b.bm")).as("i"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(m((1L, 2L)) == 3)
    assert(m((1L, 3L)) == 0)
    assert(m((2L, 3L)) == 0)
  }
}
