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
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((1L, 2L)) == 3L)
    assert(m((1L, 3L)) == 0L)
    assert(m((2L, 3L)) == 0L)
  }

  test("native bitmap_inter_count matches the built-ins fold (codegen, no fallback)") {
    val rnd = new Random(21)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(4)(rnd.nextLong()), Seq.fill(4)(rnd.nextLong()))
    }
    // fail loudly if doGenCode doesn't compile instead of silently
    // falling back to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // repartition keeps ConvertToLocalRelation from evaluating the
      // projection driver-side — the select must run through codegen
      val df = rows.toDF("id", "x", "y").repartition(2)
        .select(col("id"),
          SetSimJoin.interSize(col("x"), col("y")).as("native"),
          SetSimJoin.interSizeFold(col("x"), col("y")).as("fold"))
      assert(df.filter(col("native") =!= col("fold")).count() == 0)
      assert(df.filter(col("native") > 0).count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("bitmap_inter_count"), plan)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("bitmap_inter_count: unequal lengths treat missing words as 0; null words skipped") {
    val one = spark.sql(
      "SELECT bitmap_inter_count(array(3L, 7L), array(1L)) AS c").head().getLong(0)
    assert(one == 1L)
    val withNull = spark.sql(
      "SELECT bitmap_inter_count(array(3L, NULL), array(1L, 1L)) AS c").head().getLong(0)
    assert(withNull == 1L)
    val nullArr = spark.sql(
      "SELECT bitmap_inter_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c").head()
    assert(nullArr.isNullAt(0))
  }
}
