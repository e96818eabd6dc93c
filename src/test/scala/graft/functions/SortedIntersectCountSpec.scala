package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("native sorted_inter_count == size(array_intersect) on random sorted sets (codegen, no fallback)") {
    val rnd = new Random(17)
    val rows = (0 until 300).map { i =>
      def set() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, set(), set())
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = rows.toDF("id", "x", "y").repartition(2)
        .select(col("id"),
          call_function("sorted_inter_count", col("x"), col("y")).as("native"),
          size(array_intersect(col("x"), col("y"))).cast("long").as("builtin"))
      assert(df.filter(col("native") =!= col("builtin")).count() == 0)
      assert(df.filter(col("native") > 0).count() > 0)   // non-degenerate
      assert(df.filter(col("native") === 0).count() > 0) // both outcomes hit
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("sorted_inter_count"), plan)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("edges: empty arrays, disjoint, identical, null array") {
    assert(spark.sql(
      "SELECT sorted_inter_count(CAST(array() AS ARRAY<BIGINT>), array(1L))")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT sorted_inter_count(array(1L,2L), array(3L,4L))")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT sorted_inter_count(array(1L,2L,3L), array(1L,2L,3L))")
      .head().getLong(0) == 3L)
    assert(spark.sql(
      "SELECT sorted_inter_count(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .head().isNullAt(0))
  }

  test("interpreted eval (eval path) matches codegen result") {
    // force the interpreted path through a literal-only projection
    // evaluated driver-side by ConvertToLocalRelation
    val r = spark.sql(
      "SELECT sorted_inter_count(array(1L,5L,9L,12L), array(2L,5L,9L,13L)) AS c")
    assert(r.head().getLong(0) == 2L)
  }
}
