package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class CdsAssemblySkewSpec extends SparkSpec {
  import spark.implicits._
  import CdsAssembly._

  test("OrderedConcat aggregator assembles chunks in index order regardless of arrival") {
    val chunks = Seq(
      ExonChunk(1L, 2, "GGG"), ExonChunk(1L, 0, "AAA"), ExonChunk(1L, 1, "CCC"),
      ExonChunk(2L, 1, "TT"), ExonChunk(2L, 0, "AC"))
    val got = chunks.toDS()
      .repartition(4) // scatter chunks across partitions
      .groupByKey(_.tid)
      .agg(OrderedConcat.toColumn.name("cds"))
      .collect().toMap
    assert(got(1L) == "AAACCCGGG")
    assert(got(2L) == "ACTT")
  }

  test("OrderedConcat matches the collect_list+sort_array form on random data") {
    val rnd = new Random(3)
    val chunks = for {
      tid <- 0L until 30L
      idx <- 0 until (2 + rnd.nextInt(5))
    } yield ExonChunk(tid, idx, rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
    val ds = rnd.shuffle(chunks).toDS().repartition(8)
    val typed = ds.groupByKey(_.tid).agg(OrderedConcat.toColumn.name("cds"))
      .collect().toMap
    val untyped = ds.toDF()
      .groupBy($"tid")
      .agg(array_join(transform(
        sort_array(collect_list(struct($"exon_idx", $"dna"))), x => x("dna")), "").as("cds"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(typed == untyped)
  }

  test("salted two-phase aggregation equals plain groupBy on skewed data") {
    val rnd = new Random(5)
    // 90% of rows share one key
    val rows = (0 until 5000).map { i =>
      val k = if (rnd.nextInt(10) < 9) "hot" else s"k${rnd.nextInt(5)}"
      (k, i.toLong % 97, (i % 13).toLong)
    }
    val df = rows.toDF("k", "a", "b")
    val salted = SkewSalt.saltedSumCount(df, Seq("k"), Seq(col("a"), col("b")), salts = 8,
        sums = Seq("a", "b"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("a").as("sum_a"), sum("b").as("sum_b"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(salted.toSeq == plain.toSeq)
  }
}
