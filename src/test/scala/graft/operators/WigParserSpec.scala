package graft.operators

import graft.SparkSpec

class WigParserSpec extends SparkSpec {
  import spark.implicits._

  test("fixedStep blocks parse to (chrom, pos, score) with step arithmetic") {
    val lines = Seq(
      (10L, "fixedStep chrom=chr1 start=100 step=5"),
      (11L, "7"),
      (12L, "8"),
      (13L, "9"),
      (20L, "fixedStep chrom=chr2 start=1000 step=1"),
      (21L, "42"),
      (22L, "43"))
      .toDF("line_id", "line")
    val got = WigParser.parse(lines, binSize = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Set(
      ("chr1", 100L, 7L), ("chr1", 105L, 8L), ("chr1", 110L, 9L),
      ("chr2", 1000L, 42L), ("chr2", 1001L, 43L))
    assert(got == expect)
  }

  test("a block spanning many bins still assigns every value line") {
    val decl = Seq((0L, "fixedStep chrom=chrX start=1 step=2"))
    val values = (1L to 100L).map(i => (i, (i % 10).toString))
    val lines = (decl ++ values).toDF("line_id", "line")
    val got = WigParser.parse(lines, binSize = 8L).collect()
    assert(got.length == 100)
    val poss = got.map(_.getLong(1)).sorted
    assert(poss.head == 1L && poss.last == 199L) // 1 + (100-1)*2
  }
}
