package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedLead must equal the single-partition lead it replaces —
  * including across range-partition boundaries and empty partitions —
  * while planning NO unpartitioned window. */
class DistributedLeadSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("next_id",
      lead(col("id"), 1).over(Window.orderBy(col("id"))))

  test("matches the single-partition lead on a sparse, shuffled id frame") {
    // sparse, non-contiguous ids in scrambled input order; more
    // partitions than natural clusters so some range cuts land
    // between ids and some partitions are thin
    val ids = Seq(3L, 1000L, 7L, 2L, 999999L, 500L, 501L, 42L, 65536L, 9L)
    val df = ids.zipWithIndex.map { case (i, n) => (i, s"v$n") }.toDF("id", "tag")
    val got = DistributedLead.withNext(df, "id", "next_id", numPartitions = 4)
      .select("id", "tag", "next_id")
    val want = reference(df).select("id", "tag", "next_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"got ${got.orderBy("id").collect().mkString(",")}")
    // globally-last row has no successor
    assert(got.filter(col("id") === 999999L).select("next_id").head.isNullAt(0))
  }

  test("plans no unpartitioned window") {
    val df = (0L until 100L).map(i => (i * 3, i)).toDF("id", "x")
    val plan = DistributedLead.withNext(df, "id", "next_id", numPartitions = 4)
      .queryExecution.executedPlan.toString
    // every window spec in the plan partitions by __pid — an
    // unpartitioned spec here would be exactly the single-task sort
    // this operator exists to avoid
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(specs.nonEmpty, plan)
    specs.foreach(l => assert(l.contains("windowspecdefinition(__pid"), l))
  }
}
