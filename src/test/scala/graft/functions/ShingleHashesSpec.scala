package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  /** The composed built-in form the native expression must equal. */
  private def composed(c: org.apache.spark.sql.Column) =
    transform(TF.shingles(c, 3), s => TF.shingleHash3(s))

  test("native shingle_hashes == composed built-ins, element for element (codegen, no fallback)") {
    val rnd = new Random(23)
    val alpha = "abcdefgh XYZ0123.,é中😀" // incl. é 中 😀
    val rows = (0 until 300).map { i =>
      val len = rnd.nextInt(60)
      (i.toLong, (0 until len).map(_ => alpha.charAt(rnd.nextInt(alpha.length))).mkString)
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = rows.toDF("id", "text").repartition(2)
        .select(col("id"),
          TF.shingleHashes(col("text")).as("native"),
          composed(lower(col("text"))).as("built"))
      assert(df.filter(not(col("native") <=> col("built"))).count() == 0)
      assert(df.filter(size(col("native")) > 1).count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("shingle_hashes"), plan)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("edges: empty, 1-char, 2-char, repeated shingles deduped in first-occurrence order") {
    def run(s: String): Seq[Long] = {
      val quoted = s.replace("'", "\\'")
      spark.sql(s"SELECT shingle_hashes('$quoted') AS h")
        .head().getSeq[Long](0)
    }
    assert(run("") == Seq(0L))
    assert(run("a") == Seq((97L * 31) * 31 % 1000000007L))
    assert(run("ab") == Seq((97L * 31 + 98) * 31 % 1000000007L))
    // "abcabc": shingles abc, bca, cab, abc(dup) -> 4 positions, 3 distinct
    val h = run("abcabc")
    assert(h.length == 3)
    assert(h.head == ((97L * 31 + 98) * 31 + 99) % 1000000007L) // "abc" first
    assert(h.distinct == h)
  }
}
