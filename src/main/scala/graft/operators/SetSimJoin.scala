package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    // materialize the caller's frame once: the (possibly expensive)
    // shingle expression would otherwise re-evaluate for the dictionary
    // job, the word grouping AND the join-back — and again per side of
    // any downstream self-join
    val base = df.withColumn("sz", size(col(shCol))).localCheckpoint(true)
    val post = base.select(col(idCol), explode(col(shCol)).as("g"))
    // dictionary: one job, collected — the bitmap regime bounds the
    // element universe (same smallness contract as a broadcast dim,
    // which also bounds the driver memory this collect holds: a few
    // million distinct elements is a few hundred MB of Rows, the upper
    // end of what a driver should ever hold), and a driver-side
    // dictionary costs one pass where the join form recomputed the
    // distinct for every consumer. Elements are read generically so
    // non-string shingle columns (e.g. hashed long shingles) work too.
    val universe = post.select(col("g")).distinct().orderBy(col("g"))
      .collect().map(_.get(0))
    val nWords = (universe.length - 1) / 64 + 1
    // dict keeps the element column's own type (createDataFrame with
    // the scanned schema) so the join-back never casts
    val spark = df.sparkSession
    val dictSchema = org.apache.spark.sql.types.StructType(Seq(
      post.schema("g"),
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val dictRows = universe.zipWithIndex.map { case (g, i) =>
      org.apache.spark.sql.Row(g, i)
    }
    val dict = spark.createDataFrame(
      java.util.Arrays.asList(dictRows: _*), dictSchema)
    val words = post.join(broadcast(dict), "g")
      .groupBy(col(idCol), (col("idx") / 64).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(idx % 64 AS INT)))").as("bits"))
    val bm = words.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("wm"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(nWords - 1)),
          w => coalesce(element_at(col("wm"), w), lit(0L))).as("bm"))
    base.join(bm, idCol) // bm is tiny → broadcast; base is not reshuffled
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
