package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The growth-path guarantee behind [[graft.functions.DedupConfig.IndexBuckets]].
  *
  * IndexBuckets = 8 is the one pinned constant whose justification was
  * prose until r16: COVERAGE argues it is a CAPACITY parameter (per-
  * bucket bytes are held under a ~256 MB deployment target by the
  * nb -> 2nb compaction job, not by retuning the constant), but nothing
  * asserted the growth path actually delivers that. This spec runs the
  * capacity story end-to-end at test scale (target scaled 1000x, so
  * ~256 KB stands in for ~256 MB):
  *
  *   1. a corpus sized for nb=IndexBuckets sits UNDER the per-bucket
  *      target — the write-time sizing rule `indexBytes / target`;
  *   2. the corpus DOUBLES (epoch appends, q99/q109's growth mode) and
  *      the max per-bucket bytes now EXCEEDS the target — the capacity
  *      is genuinely outgrown, not merely fragmented;
  *   3. one [[Bucketed.compact]] to 2*nb restores max per-bucket bytes
  *      to under the target, at ~half the grown size, with identical
  *      rows.
  *
  * Per-bucket bytes are measured from the files themselves (bucket id
  * lives in the file NAME, `..._00003.c000...`), summed across the
  * append-accumulated file sets of each bucket — the same quantity an
  * operator would watch on a real deployment.
  */
class IndexBucketsGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("doubling the corpus outgrows IndexBuckets' per-bucket target; compact nb->2nb restores it") {
    val nb = graft.functions.DedupConfig.IndexBuckets
    val t = "graft_growth_bkt"
    val p = "/root/repo/tmp/growth_bkt"
    // production target ~256 MB per bucket, scaled 1000x for the test
    val targetBytes = 256000L
    spark.sql(s"DROP TABLE IF EXISTS $t")

    // max over buckets of the summed file bytes carrying that bucket id
    def maxBucketBytes(): Long = {
      val bucketId = """_(\d{5})\.""".r
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(p))
        .groupBy(f => bucketId.findFirstMatchIn(f.getName).map(_.group(1))
          .getOrElse(fail(s"no bucket id in file name ${f.getName}")))
        .values.map(_.map(_.length).sum).max
    }

    // deterministic ~128-byte incompressible payload per row (hex of
    // two sha2 digests — no RNG, reproducible across rounds); 12000
    // rows x ~132 B / 8 buckets ~= 198 KB per bucket, under the target
    def half(offset: Int) = (0 until 12000).toDF("i")
      .select(($"i" + offset).cast("long").as("k"),
        concat(sha2(($"i" + offset).cast("string"), 256),
          sha2(($"i" + offset + 999983).cast("string"), 256)).as("payload"))

    try {
      Bucketed.writeBucketed(half(0), t, nb, Seq("k"), path = Some(p))
      val maxInitial = maxBucketBytes()
      assert(maxInitial <= targetBytes,
        s"write-time sizing must start under target ($maxInitial > $targetBytes)")

      // the corpus doubles via an epoch append (q99/q109 growth mode)
      Bucketed.writeBucketed(half(1000000), t, nb, Seq("k"),
        mode = "append", path = Some(p))
      val maxGrown = maxBucketBytes()
      val rowsGrown = spark.table(t).count()
      val sumGrown = spark.table(t).agg(sum($"k")).head.getLong(0)
      assert(rowsGrown == 24000L)
      assert(maxGrown > targetBytes,
        s"doubled corpus must exceed the per-bucket target ($maxGrown <= $targetBytes) " +
          "or the growth premise is untested")

      Bucketed.compact(spark, t, 2 * nb, Seq("k"), p)

      val maxAfter = maxBucketBytes()
      assert(spark.table(t).count() == rowsGrown, "compact must not change rows")
      assert(spark.table(t).agg(sum($"k")).head.getLong(0) == sumGrown)
      assert(maxAfter <= targetBytes,
        s"nb->2nb compaction must restore per-bucket bytes under target " +
          s"($maxAfter > $targetBytes)")
      // hash partitioning spreads keys near-uniformly, so doubling the
      // bucket count ~halves the max; 0.65 leaves room for skew +
      // per-file footer overhead while still proving real redistribution
      assert(maxAfter <= (maxGrown * 0.65).toLong,
        s"compaction must ~halve the max bucket ($maxAfter vs grown $maxGrown)")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(p))
    }
  }
}
