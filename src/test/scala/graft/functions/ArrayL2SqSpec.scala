package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayL2SqSpec extends SparkSpec {
  import spark.implicits._

  test("native array_l2sq == the zip_with/aggregate fold it replaced (codegen, no fallback)") {
    // fixed-point-scale coordinates, the operator's real input domain
    val rnd = new Random(23)
    val rows = (0 until 300).map { i =>
      def vec() = Seq.fill(16)(rnd.nextInt(20001).toLong - 10000L)
      (i.toLong, vec(), vec())
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = rows.toDF("id", "x", "y").repartition(2)
        .select(col("id"),
          call_function("array_l2sq", col("x"), col("y")).as("native"),
          aggregate(zip_with(col("x"), col("y"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, v) => acc + v).as("fold"))
      assert(df.filter(col("native") =!= col("fold")).count() == 0)
      assert(df.filter(col("native") > 0).count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("array_l2sq"), plan)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("edges mirror the fold: empty 0, identical 0, length mismatch null, null poisons") {
    assert(spark.sql(
      "SELECT array_l2sq(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>))")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT array_l2sq(array(5L,-3L), array(5L,-3L))")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT array_l2sq(array(3L), array(1L))")
      .head().getLong(0) == 4L)
    // zip_with pads the shorter array with null -> fold is null
    assert(spark.sql("SELECT array_l2sq(array(1L,2L), array(1L))").head().isNullAt(0))
    assert(spark.sql("SELECT array_l2sq(array(1L, NULL), array(1L, 2L))").head().isNullAt(0))
    assert(spark.sql("SELECT array_l2sq(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .head().isNullAt(0))
  }

  test("interpreted eval path agrees with codegen (constant folding)") {
    // a literal-only projection is evaluated by ConstantFolding at
    // optimization time, which calls nullSafeEval directly — that is
    // what exercises the interpreted path here (not WSCG disabling)
    val r = spark.sql(
      "SELECT array_l2sq(array(1000L, 2000L, 3000L), array(1003L, 1996L, 3000L)) AS d")
      .head().getLong(0)
    assert(r == 9L + 16L)
  }
}
