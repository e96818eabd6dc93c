package graft

import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** Edge-case coverage for the corpus-cleaning queries that the
  * synthetic sf corpus cannot exercise: q102 (global chunk dedup —
  * first-occurrence-wins, whole-doc elimination, sub-chunk docs) and
  * q103 (unigram-LM frequency scoring — hand-computed metrics,
  * below-mean counting). The DuckDB oracle gates the full-corpus
  * behavior; these fixtures gate the corners.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = Catalog.all.find(_.name == name).get

  /** Writes a documents.parquet fixture and returns its directory. */
  private def fixture(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q102: first occurrence wins globally; repeat-only docs clean to empty") {
    // 25 words -> chunks of 20: doc 0 = [w0..w19], [w20..w24].
    val first25 = (0 until 25).map(i => s"w$i").mkString(" ")
    val chunkA = (0 until 20).map(i => s"w$i").mkString(" ")   // doc 0 chunk 0
    val tail5 = (20 until 25).map(i => s"w$i").mkString(" ")   // doc 0 chunk 1
    val fresh20 = (0 until 20).map(i => s"f$i").mkString(" ")
    val dir = fixture(Seq(
      (0L, first25, "en", "s"),              // both chunks are first occurrences
      (1L, chunkA, "en", "s"),               // exact repeat of doc 0 chunk 0 -> dropped
      (2L, s"$chunkA $tail5", "en", "s"),    // both chunks repeat doc 0 -> cleaned to ""
      (3L, "tiny", "en", "s"),               // sub-chunk doc, unique -> kept whole
      (4L, s"$fresh20 $tail5", "en", "s")))  // new chunk + repeat of doc 0 chunk 1
    val out = q("q102_chunk_dedup").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(out(0L) == ((2L, 2L, first25)))           // untouched
    assert(out(1L) == ((1L, 0L, "")))                // fully deduplicated away
    assert(out(2L) == ((2L, 0L, "")))                // every chunk was seen before
    assert(out(3L) == ((1L, 1L, "tiny")))
    assert(out(4L) == ((2L, 1L, fresh20)))           // repeat tail dropped
  }

  test("q102: in-doc repeated chunk keeps only its first instance") {
    val c = (0 until 20).map(i => s"x$i").mkString(" ")
    val dir = fixture(Seq((7L, s"$c $c", "en", "s")))
    val r = q("q102_chunk_dedup").fn(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((2L, 1L, c)))
  }

  test("q103: hand-computed LM metrics on a 3-doc corpus") {
    // token stream: a a a b | a b c | c  -> counts a=4, b=2, c=2; total=8, vocab=3
    // below-mean: cnt*3 < 8 -> b (6<8) and c (6<8) are below-mean, a (12) is not
    val dir = fixture(Seq(
      (0L, "a a a b", "en", "s"),
      (1L, "a b c", "en", "s"),
      (2L, "c", "en", "s")))
    val rows = q("q103_unigram_lm").fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // doc 0: n=4, sum=4+4+4+2=14, avg_x1000=14000/4=3500, min=2, below-mean tokens: the single b
    assert(rows(0L) == ((4L, 14L, 3500L, 2L, 1L)))
    // doc 1: n=3, sum=4+2+2=8, avg=8000 div 3=2666, min=2, below-mean: b and c
    assert(rows(1L) == ((3L, 8L, 2666L, 2L, 2L)))
    // doc 2: n=1, sum=2, avg=2000, min=2, below-mean: c
    assert(rows(2L) == ((1L, 2L, 2000L, 2L, 1L)))
  }

  test("q100: empty and 1-token docs flow through the funnel without crashing") {
    // regression: the bigram transform over sequence(1, size-1) used to
    // evaluate element_at(toks, 0) on these docs (sequence(1,0) is the
    // DESCENDING [1,0], not empty) and threw under ANSI mode
    val healthy = ("the quick brown fox jumps over the lazy dog near " +
      "the old stone bridge today again") // 16 tokens, plausible lengths
    val dir = fixture(Seq(
      (0L, "", "en", "s"),
      (1L, "one", "en", "s"),
      (2L, healthy, "en", "s")))
    val rows = q("q100_cleaning_funnel").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size == 4)
    // stage 1 (lang_id) sees all 3 docs plus q100's injected copy of
    // doc 0 (doc_id % 9 == 0); nothing downstream throws
    assert(rows(1L)._1 + rows(1L)._2 == 4L)
  }
}
