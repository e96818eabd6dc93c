package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over a long key column, built and probed
  * entirely with declarative (codegen'd) expressions — no UDFs, no
  * driver-side sketch objects, no custom aggregate.
  *
  * Build: each key sets `k` bit positions (`pmod(xxhash64(key, i),
  * numBits)`); positions fold into 64-bit words via `bit_or` groupBy
  * (map-side partial aggregation collapses the stream to ≤ nWords rows
  * per task before the exchange), and the words assemble into ONE
  * dense `array<long>` row — small by construction (a 2^20-bit filter
  * is 16K longs = 128 KB), so probing broadcasts it like any dim.
  *
  * Probe: `mayContain` tests the k positions with shiftright+AND on
  * the broadcast array. No false negatives ever (a member's bits are
  * all set by construction); false-positive rate is the standard
  * (1 - e^{-kn/m})^k — callers use the filter as a PRE-filter and
  * exact-confirm the survivors, so correctness never depends on the
  * FP rate, only shuffle volume does.
  *
  * 100 TB note: this single-row assembly is right while the filter
  * itself is dim-sized (≤ a few hundred MB — n up to ~10^9 keys at
  * 10 bits/key). Beyond that, skip [[build]]'s final assembly and keep
  * the `(word_idx, bits)` frame partitioned by word_idx — probes
  * become an equi-join on `word_idx` (blocked Bloom), same expressions
  * otherwise.
  *
  * Reference analogue: the reference deduplicates by loading existing
  * key sets into per-run in-memory hash maps (e.g.
  * VariantLoader.java's variant cache); at corpus scale the Bloom
  * pre-filter is the memory-bounded replacement for that idiom.
  */
object BloomFilter {

  /** The k probe positions for `key` in a `numBits`-bit filter.
    * Deterministic: xxhash64 seeded by the probe index. */
  private def positions(key: Column, numBits: Long, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(numBits)))

  /** Builds the filter over `df(keyCol)` (long). Returns a one-row
    * frame with column `bloom: array<long>` of ceil(numBits/64) words.
    * Cost: one map-only projection + one groupBy on ≤ numBits/64 keys
    * + a ≤ nWords-row final assembly. */
  def build(df: DataFrame, keyCol: String, numBits: Long, k: Int): DataFrame = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    val nWords = numBits / 64
    df.select(explode(array(positions(col(keyCol), numBits, k): _*)).as("pos"))
      .select(floor(col("pos") / 64).as("word_idx"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64)).cast("int")).as("bit"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(bit)").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("bits"))))
        .as("words"))
      .select(transform(sequence(lit(0L), lit(nWords - 1)),
        w => coalesce(element_at(col("words"), w), lit(0L))).as("bloom"))
  }

  /** Membership predicate: true iff every probe bit of `key` is set in
    * `bloom` (the array from [[build]], typically ridden in via
    * `crossJoin(broadcast(bloomRow))`). Must be called with the same
    * (numBits, k) the filter was built with. */
  def mayContain(bloom: Column, key: Column, numBits: Long, k: Int): Column =
    positions(key, numBits, k).map { p =>
      val wordIdx = floor(p / 64).cast("int") + 1 // element_at is 1-based
      val bitPos = pmod(p, lit(64)).cast("int")
      call_function("shiftright", element_at(bloom, wordIdx), bitPos)
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
}
