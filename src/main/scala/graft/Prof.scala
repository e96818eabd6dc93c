package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.functions.DedupConfig.{K, Bands, Rpb, JaccThreshold, sizeRatioOk}

/** Stage-level profiler for perf work on the heavy queries: times each
  * phase of the Jaccard/MinHash dedup family in isolation so
  * optimization effort goes where the seconds are. Not part of the
  * driver gates; run with
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Prof"`. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("read+count")(docs.count())

    val sh = docs.select(col("doc_id"), col("lang"), TF.shingles(col("text"), 3).as("sh"))
    time("shingles")(sh.count())

    val bm = time("withBitmap build")(
      graft.operators.SetSimJoin.withBitmap(sh, "doc_id", "sh")
        .select(col("doc_id"), col("lang"), col("sz"), col("bm"))
        .localCheckpoint(true))
    time("withBitmap count")(bm.count())

    // pair join WITHOUT popcount (enumeration + ratio filter only)
    val enum0 = bm.as("a").join(broadcast(bm.as("b")),
      col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id") &&
        sizeRatioOk(col("a.sz"), col("b.sz")))
    time("pair enum (no popcount)")(enum0.count())

    val pairs = enum0
      .withColumn("jacc_x1000", graft.operators.SetSimJoin.jaccardX1000(
        col("a.bm"), col("b.bm"), col("a.sz"), col("b.sz")))
      .filter(col("jacc_x1000") >= JaccThreshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("jacc_x1000"))
    val nPairs = time("pair enum + popcount")(pairs.count())
    println(s"PROF   near-dup pairs: $nPairs")

    val cached = pairs.localCheckpoint(true)
    time("CC on cached pairs")(
      graft.operators.ConnectedComponents.components(cached, "doc_a", "doc_b").count())

    // q41 phases
    val sig = time("q41 sig build")(
      graft.operators.SetSimJoin.withBitmap(
          docs.select(col("doc_id"), TF.shingles(col("text"), 3).as("sh")), "doc_id", "sh")
        .withColumn("hl", transform(col("sh"), s => TF.shingleHash3(s)))
        .withColumn("sig", TF.minhashSignatureNative(col("hl"), K))
        .localCheckpoint(true))
    val bands = sig.select(col("doc_id"), col("sz"), col("bm"),
      posexplode(array((0 until Bands).map(b =>
        TF.bandKey(col("sig"), b, Rpb)): _*)).as(Seq("band_idx", "band_key")))
    time("q41 bands count")(bands.count())
    val cand = bands.as("a").join(broadcast(bands.as("b")),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id") &&
        sizeRatioOk(col("a.sz"), col("b.sz")))
    time("q41 candidates")(println(s"PROF   q41 cand rows: ${cand.count()}"))
    val verified = cand
      .withColumn("jacc_x1000", graft.operators.SetSimJoin.jaccardX1000(
        col("a.bm"), col("b.bm"), col("a.sz"), col("b.sz")))
      .filter(col("jacc_x1000") >= JaccThreshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("jacc_x1000"))
    time("q41 verify")(verified.count())
    time("q41 distinct")(verified.distinct().count())

    spark.stop()
  }
}
