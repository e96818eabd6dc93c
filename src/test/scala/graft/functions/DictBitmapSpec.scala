package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DictBitmapSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bitmap: rank-in-sorted-universe bit per present element. */
  private def expected(elems: Seq[String], universe: Seq[String], nWords: Int): Seq[Long] = {
    val idx = universe.zipWithIndex.toMap
    val words = new Array[Long](nWords)
    elems.flatMap(idx.get).foreach(i => words(i >> 6) |= 1L << (i & 63))
    words.toSeq
  }

  test("string bitmap == rank-in-sorted-universe reference (codegen, no fallback)") {
    val rnd = new Random(29)
    val universe = (0 until 150).map(i => f"sh$i%03d") // sorted by construction
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(universe(rnd.nextInt(universe.size))).distinct)
    }
    val nWords = (universe.size - 1) / 64 + 1
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = rows.toDF("id", "sh").repartition(2)
        .select(col("id"),
          call_function("dict_bitmap", col("sh"), lit(universe.toArray), lit(nWords)).as("bm"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      rows.foreach { case (id, elems) =>
        assert(out(id) == expected(elems, universe, nWords), s"row $id")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("long bitmap; absent and null elements set no bit; 65+ element universe spans words") {
    val universe = (0L until 130L).map(_ * 3) // sorted
    val nWords = 3
    val r = spark.sql(
      s"""SELECT dict_bitmap(array(0L, 3L, 192L, 5L, NULL, 387L),
         |  array(${universe.mkString("L,")}L), 3) AS bm""".stripMargin)
      .head().getSeq[Long](0)
    // 0 -> idx 0, 3 -> idx 1, 192 -> idx 64, 387 -> idx 129; 5 absent, NULL skipped
    assert(r == Seq(3L, 1L, 2L))
  }

  test("undersized nWords fails loudly instead of corrupting memory") {
    val e = intercept[Exception] {
      spark.sql("SELECT dict_bitmap(array(1L), array(" +
        (0L until 65L).mkString("L,") + "L), 1) AS bm").collect()
    }
    // the cause chain ends in our capacity check, not an AIOOBE
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("dict_bitmap: universe has 65")))
  }

  test("matches the former dataflow build through withBitmap on both element types") {
    // string elements
    val docs = Seq(
      (1L, Seq("abc", "bcd", "cde")),
      (2L, Seq("bcd", "xyz")),
      (3L, Seq.empty[String])).toDF("doc_id", "sh")
    val bm = graft.operators.SetSimJoin.withBitmap(docs, "doc_id", "sh")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("sz"), r.getSeq[Long](r.fieldIndex("bm")))).toMap
    // universe sorted: abc,bcd,cde,xyz -> idx 0,1,2,3
    assert(bm(1L) == (3L, Seq(0x7L)))
    assert(bm(2L) == (2L, Seq(0xAL)))
    assert(bm(3L) == (0L, Seq(0x0L)))
    // long elements (hashed-shingle representation)
    val ldocs = Seq((1L, Seq(30L, 10L)), (2L, Seq(20L))).toDF("doc_id", "sh")
    val lbm = graft.operators.SetSimJoin.withBitmap(ldocs, "doc_id", "sh")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("bm"))).toMap
    assert(lbm(1L) == Seq(0x5L)) // 10 -> bit0, 30 -> bit2
    assert(lbm(2L) == Seq(0x2L)) // 20 -> bit1
  }
}
