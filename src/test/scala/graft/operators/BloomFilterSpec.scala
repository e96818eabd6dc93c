package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val NumBits = 1L << 16 // 64 Kbit for the test sizes below
  private val K = 3

  test("no false negatives: every inserted key passes mayContain") {
    val keys = (0L until 2000L).map(i => i * 2654435761L % 1000000007L)
    val df = keys.toDF("key")
    val bloom = BloomFilter.build(df, "key", NumBits, K)
    val misses = df.crossJoin(broadcast(bloom))
      .filter(!BloomFilter.mayContain(col("bloom"), col("key"), NumBits, K))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate on disjoint keys stays near the sizing formula") {
    val members = (0L until 2000L).toDF("key")
    val bloom = BloomFilter.build(members, "key", NumBits, K)
    val probes = (1000000L until 1020000L).toDF("key") // disjoint from members
    val fp = probes.crossJoin(broadcast(bloom))
      .filter(BloomFilter.mayContain(col("bloom"), col("key"), NumBits, K))
      .count()
    // (1 - e^{-kn/m})^k with n=2000, m=65536, k=3 ≈ 0.06% — allow 10x slack
    assert(fp.toDouble / 20000 < 0.006, s"FP rate ${fp.toDouble / 20000}")
  }

  test("empty build yields an all-zero filter that rejects everything") {
    val empty = Seq.empty[Long].toDF("key")
    val bloom = BloomFilter.build(empty, "key", NumBits, K)
    assert(bloom.count() == 1L)
    val hits = (0L until 100L).toDF("key").crossJoin(broadcast(bloom))
      .filter(BloomFilter.mayContain(col("bloom"), col("key"), NumBits, K))
      .count()
    assert(hits == 0L)
  }

  test("filter array has exactly numBits/64 words") {
    val bloom = BloomFilter.build(Seq(1L, 2L).toDF("key"), "key", NumBits, K)
    assert(bloom.select(size(col("bloom"))).as[Int].head() == (NumBits / 64).toInt)
  }
}
