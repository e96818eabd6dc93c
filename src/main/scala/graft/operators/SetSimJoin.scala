package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact set-similarity (Jaccard) machinery for n-gram/shingle sets.
  *
  * Two regimes exist for exact set-similarity joins:
  *
  *  - **Large element universe** (real-world text shingles): prefix
  *    filtering (PPJoin-style) prunes candidate pairs — sets with
  *    J >= t must share an element among their (1-t)·|A|+1 globally
  *    rarest elements.
  *  - **Small element universe** (numUniverse up to ~100k): pruning is
  *    hopeless because every element is frequent, but the whole
  *    universe fits in a per-row bitmap; |A∩B| becomes AND + popcount
  *    over a handful of longs — two orders of magnitude cheaper than
  *    hash-set intersection of string arrays, which turns the
  *    unavoidable pair enumeration from the bottleneck into a cheap
  *    scan.
  *
  * This object implements the bitmap regime (the test corpus has a
  * ~400-shingle universe); the candidate *enumeration* strategy (LSH
  * bands, language blocking, size-ratio cuts) stays with the caller.
  */
object SetSimJoin {

  /** Attach a dense element dictionary and per-row bitmap to `df`,
    * which must carry an array column `shCol` of distinct elements.
    * Output columns: all of `df` plus `sz` (set size) and `bm`
    * (array<long> bitmap, fixed length = ceil(universe/64)).
    *
    * The dictionary index is a row_number over the sorted universe —
    * a single-partition window over universe-many rows (fine up to
    * millions of distinct elements; beyond that, use the prefix-filter
    * regime instead). */
  def withBitmap(df: DataFrame, idCol: String, shCol: String): DataFrame = {
    // materialize the exploded (id, element) frame once: it feeds the
    // dictionary distinct, the driver-side universe-size scalar AND the
    // word grouping — without the checkpoint the caller's (possibly
    // expensive) shingle expression re-evaluates for each of the three
    val post = df.select(col(idCol), explode(col(shCol)).as("g"))
      .localCheckpoint(true)
    val dict = post.select(col("g")).distinct()
      .withColumn("idx", row_number().over(Window.orderBy(col("g"))) - 1)
    // one driver-side scalar (universe size), same role as AQE stats
    val nWords = dict.agg(max(col("idx")).as("m")).head().getInt(0) / 64 + 1
    val words = post.join(broadcast(dict), "g")
      .groupBy(col(idCol), (col("idx") / 64).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(idx % 64 AS INT)))").as("bits"))
    val bm = words.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("wm"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(nWords - 1)),
          w => coalesce(element_at(col("wm"), w), lit(0L))).as("bm"))
    df.join(bm, idCol).withColumn("sz", size(col(shCol)))
  }

  /** |A∩B| from two equal-length bitmaps: popcount of the AND, as the
    * native codegen expression `bitmap_inter_count`
    * ([[graft.functions.BitmapIntersectCount]], registered by
    * `GraftExtensions`) — a fused per-pair loop with no intermediate
    * array. */
  def interSize(bmA: Column, bmB: Column): Column =
    call_function("bitmap_inter_count", bmA, bmB)

  /** Built-ins-only form of [[interSize]] (`zip_with` + `aggregate`
    * fold); works without `GraftExtensions`, used to cross-check the
    * native expression. */
  def interSizeFold(bmA: Column, bmB: Column): Column =
    aggregate(zip_with(bmA, bmB, (x, y) => bit_count(x.bitwiseAND(y))),
      lit(0), (acc, x) => acc + x).cast("long")

  /** floor(1000 * J(A,B)) via bitmaps + set sizes (integer division —
    * mirrors `(inter * 1000) DIV union`). */
  def jaccardX1000(bmA: Column, bmB: Column, szA: Column, szB: Column): Column = {
    val inter = interSize(bmA, bmB)
    ((inter * 1000).cast("long") / (szA + szB - inter)).cast("long")
  }
}
