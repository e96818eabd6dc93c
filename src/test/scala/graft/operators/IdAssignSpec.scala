package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class IdAssignSpec extends SparkSpec {
  import spark.implicits._

  test("assignDense ids equal global row_number order, without a global window") {
    val rnd = new Random(9)
    val rows = rnd.shuffle((0 until 3000).map(i => (f"k$i%05d", i.toLong)))
    val df = rows.toDF("k", "v").repartition(16)
    val got = IdAssign.assignDense(df, Seq("k"), "id", offset = 1000L, numPartitions = 8)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // expected: offset + rank in sorted-key order
    val expect = rows.map(_._1).sorted.zipWithIndex.map { case (k, i) => (k, 1000L + i + 1) }
    assert(got.toSeq == expect)
  }

  test("assignDense is deterministic across runs with fixed partition count") {
    val rows = (0 until 500).map(i => (s"x${(i * 37) % 499}$i", i))
    val df = rows.toDF("k", "v")
    val a = IdAssign.assignDense(df, Seq("k"), "id", numPartitions = 5)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = IdAssign.assignDense(df.repartition(11), Seq("k"), "id", numPartitions = 5)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
