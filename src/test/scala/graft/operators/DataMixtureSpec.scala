package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** q111's two-phase quota fill (bucket histogram + straddle-bucket
  * sort) must equal the sequential spec — a global per-language
  * windowed greedy — on data the oracle gates never see: adversarial
  * token-count skew, a language whose total is under budget
  * (take-all), and a language far over budget. The DuckDB gate proves
  * equivalence on the fixture corpora; this spec proves it on a frame
  * built to stress the bucket boundaries (sum_id is the witness — two
  * different selections of equal size/token mass still differ in it).
  */
class DataMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase quota fill equals the global windowed greedy") {
    val fixture = "/root/repo/tmp/mixturespec"
    // deterministic pseudo-random docs: "aa" stays under its budget
    // (take-all edge), "bb"/"cc" overflow it several times over
    val docs = (1 to 4000).map { i =>
      val lang = if (i <= 120) "aa" else if (i % 2 == 0) "bb" else "cc"
      val t = 1 + (i * 2654435761L % 39).toInt
      (i.toLong, lang, Seq.fill(t)("tok").mkString(" "), "synth")
    }.toDF("doc_id", "lang", "text", "source")
    docs.write.mode("overwrite").parquet(s"$fixture/documents.parquet")

    val engine = graft.SparkEntry.queries("q111_data_mixture")(spark, fixture)
      .collect().map(_.toSeq).toSeq

    // the sequential spec, implemented directly
    val budget = when($"lang" === "en", 8000L).otherwise(5000L)
    val d = spark.read.parquet(s"$fixture/documents.parquet")
      .select($"doc_id", $"lang", TF.tokenCount($"text").cast("long").as("t"),
        md5(concat($"doc_id".cast("string"), lit(":mix"))).as("h"))
    val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = d.withColumn("cum", coalesce(sum($"t").over(w), lit(0L)))
      .filter($"cum" < budget)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"t").as("sum_tokens"),
        sum($"doc_id").as("sum_id"))
      .orderBy($"lang")
      .collect().map(_.toSeq).toSeq

    assert(engine == naive,
      s"two-phase fill diverged from the windowed greedy:\n$engine\nvs\n$naive")
    // the take-all edge actually happened for "aa" and the budget
    // actually bound for "bb"/"cc" — otherwise the test is vacuous
    val byLang = naive.map(r => r.head -> r(2).asInstanceOf[Long]).toMap
    assert(byLang("aa") < 5000L, s"aa should be under budget: $byLang")
    assert(byLang("bb") >= 4950L && byLang("cc") >= 4950L,
      s"bb/cc should fill their budget nearly exactly: $byLang")
  }
}
