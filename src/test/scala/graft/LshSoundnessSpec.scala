package graft

import graft.functions.{TextFunctions => TF}
import graft.functions.DedupConfig.{K, Bands, Rpb, JaccThreshold, sizeRatioOk}
import org.apache.spark.sql.functions._

/** Soundness of the word-granularity LSH dedup (q108): every pair it
  * reports must be a TRUE near-dup pair — i.e. a subset of the exact
  * all-pairs prefix-filter join over the same hashed-bigram sets, with
  * identical integer jaccard values. (Completeness is the band
  * scheme's probabilistic property and is what the DuckDB oracle pins
  * exactly, by replaying the same bands; this spec pins the other
  * direction against an independent exact operator.) */
class LshSoundnessSpec extends SparkSpec {

  test("q108 LSH pairs are a subset of exact prefix-filter pairs, same jaccard") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bg = docs
      .select(col("doc_id"), TF.tokens(lower(col("text"))).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), sort_array(array_distinct(
        transform(sequence(lit(1), size(col("t")) - 1),
          i => TF.polyHash(concat(element_at(col("t"), i), lit(" "),
            element_at(col("t"), i + 1)))))).as("hl"))

    // exact reference: all pairs with jacc >= threshold
    val exact = graft.operators.SetSimJoin
      .prefixFilterJoin(bg, "doc_id", "hl", JaccThreshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("jacc_x1000"))

    // the q108 shape (signature -> bands -> self-join -> sorted verify)
    val base = bg
      .withColumn("sz", size(col("hl")).cast("long"))
      .withColumn("sig", TF.minhashSignatureNative(col("hl"), K))
      .localCheckpoint(true)
    val bands = base.select(col("doc_id"), col("sz"), col("hl"),
      posexplode(array((0 until Bands).map(b =>
        TF.bandKey(col("sig"), b, Rpb)): _*)).as(Seq("band_idx", "band_key")))
    val lsh = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id") &&
          sizeRatioOk(col("a.sz"), col("b.sz")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"),
        call_function("sorted_inter_count",
          col("a.hl"), col("b.hl")).as("inter"))
      .withColumn("jacc_x1000", expr("inter * 1000 DIV (sz_a + sz_b - inter)"))
      .filter(col("jacc_x1000") >= JaccThreshold)
      .select(col("doc_a"), col("doc_b"), col("jacc_x1000"))
      .distinct()

    val nLsh = lsh.count()
    assert(nLsh > 0, "fixture produced no near-dup pairs — spec is vacuous")
    val unsound = lsh.exceptAll(exact)
    assert(unsound.isEmpty,
      s"LSH reported pairs not in the exact join: ${unsound.collect().toSeq}")
  }
}
