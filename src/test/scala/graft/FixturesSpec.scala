package graft

import graft.queries.{Fixtures, Synthetic}
import org.apache.spark.sql.functions._

/** The shared gate fixture: staged unique-vid base must equal the
  * per-gate groupBy it replaced, including under a group-key filter
  * (q105 filters the staged aggregate by vid%8 — legal only because
  * filter-then-aggregate commutes with aggregate-then-filter when the
  * predicate is on the group key). */
class FixturesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("staged dedup base equals the direct groupBy(vid) aggregation") {
    val staged = Fixtures.dedupVariants(spark, dir)
    val direct = Synthetic.variants(spark, dir)
      .groupBy(col("vid"))
      .agg(min(col("sample_id")).as("sample_id"),
        min(col("chromosome")).as("chromosome"),
        min(col("start_pos")).as("start_pos"),
        min(col("ref_nuc")).as("ref_nuc"),
        min(col("var_nuc")).as("var_nuc"),
        min(col("total_depth")).as("total_depth"))
    assert(staged.exceptAll(direct).isEmpty && direct.exceptAll(staged).isEmpty)
  }

  test("group-key filter commutes: staged-then-filter == filter-then-group") {
    val fromStaged = Fixtures.dedupVariants(spark, dir)
      .filter(col("vid") % 8 === 0)
      .select("vid", "chromosome", "total_depth")
    val direct = Synthetic.variants(spark, dir)
      .filter(col("vid") % 8 === 0)
      .groupBy(col("vid"))
      .agg(min(col("chromosome")).as("chromosome"),
        min(col("total_depth")).as("total_depth"))
    assert(fromStaged.exceptAll(direct).isEmpty &&
      direct.exceptAll(fromStaged).isEmpty)
  }

  test("second call reuses the staged path (no rewrite)") {
    Fixtures.dedupVariants(spark, dir)
    val f = new java.io.File(
      s"${graft.queries.QueriesSources.FixtureDir}/dedup_variants_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val t0 = f.lastModified()
    Fixtures.dedupVariants(spark, dir).count()
    assert(f.lastModified() == t0)
  }

  test("modPredicates covers disjointly") {
    assert(Fixtures.modPredicates("vid", 2) ==
      Seq("""MOD("vid", 2) = 0""", """MOD("vid", 2) = 1"""))
  }
}
