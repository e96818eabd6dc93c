package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.Random

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("map-side top-k aggregator equals the window row_number form") {
    val rnd = new Random(17)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong)
    } // (group, score, tag)
    val ds = rows.toDS().toDF("g", "score", "tag").repartition(7)

    val viaAgg = ds.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TopK.topK(5).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g"), posexplode(col("top")).as(Seq("rank", "st")))
      .select(col("g"), col("rank"), col("st._1").as("score"), col("st._2").as("tag"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("tag"))
    val viaWindow = ds
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).as("rank"), col("score"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("merge keeps order and bound with adversarial tie scores") {
    val agg = TopK.topK(3)
    val a = Seq((9L, 2L), (9L, 5L), (1L, 1L))
    val b = Seq((9L, 1L), (5L, 0L))
    val m = agg.merge(a, b)
    assert(m == Seq((9L, 1L), (9L, 2L), (9L, 5L)))
    // reduce inserts mid-list and trims
    val r = agg.reduce(m, (9L, 0L))
    assert(r == Seq((9L, 0L), (9L, 1L), (9L, 2L)))
  }
}
