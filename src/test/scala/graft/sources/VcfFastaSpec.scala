package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VcfFastaSpec extends SparkSpec {
  import spark.implicits._

  private def writeTemp(name: String, content: String): String = {
    val dir = Files.createTempDirectory(name)
    val f = dir.resolve("data.txt")
    Files.writeString(f, content)
    f.toString
  }

  test("VCF read: strains from header, ## skipped, one row per (line, strain)") {
    val vcf =
      """##fileformat=VCFv4.2
        |##contig=<ID=1>
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	strainA	strainB
        |1	100	rs1	A	C	50	PASS	DP=10	GT:AD	0/1:3,7	1/1:0,9
        |2	200	.	G	T	60	PASS	DP=20	GT:AD	0/0:8,0	./.:.
        |""".stripMargin
    val path = writeTemp("vcf", vcf)
    assert(Vcf.strainNames(spark, path) == Seq("strainA", "strainB"))
    val df = Vcf.read(spark, path)
    assert(df.count() == 4)
    val r = df.filter($"pos" === 100L && $"strain" === "strainB").collect().head
    assert(r.getAs[String]("gt") == "1/1:0,9")
    assert(r.getAs[String]("ref") == "A" && r.getAs[String]("alt") == "C")
    // genotype filter downstream (F4)
    val kept = df.withColumn("g", split($"gt", ":")(0))
      .filter(!$"g".isin("./.", "0/0", "."))
    assert(kept.count() == 2)
  }

  test("VCF writeSorted: header first, then numeric (chr, pos, id) order") {
    val lines = Seq(
      ("2", 5L, "b", "2\t5\tb\t..."),
      ("1", 100L, "a", "1\t100\ta\t..."),
      ("1", 20L, "Z", "1\t20\tZ\t..."))
      .toDF("chrom", "pos", "id", "line")
    val dir = Files.createTempDirectory("vcfout").toString + "/out"
    Vcf.writeSorted(spark, lines, Seq("##fileformat=VCFv4.2", "#CHROM\tPOS"), dir)
    val out = spark.read.text(dir).collect().map(_.getString(0))
    assert(out.take(2).toSeq == Seq("##fileformat=VCFv4.2", "#CHROM\tPOS"))
    assert(out.drop(2).toSeq == Seq("1\t20\tZ\t...", "1\t100\ta\t...", "2\t5\tb\t..."))
  }

  test("FASTA parse + chunk + random access across chunk borders") {
    // chr1: 26 bases (alphabet), lines of 10; chr2: 8 bases
    val lines = Seq(
      (0L, ">chr1"),
      (1L, "ABCDEFGHIJ"),
      (2L, "KLMNOPQRST"),
      (3L, "UVWXYZ"),
      (10L, "> chr2"),
      (11L, "ACGTACGT"))
      .toDF("line_id", "line")
    val parsed = Fasta.parseLines(lines)
    val offs = parsed.filter($"chr" === "chr1").orderBy("start_off")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(offs.toSeq == Seq((0L, "ABCDEFGHIJ"), (10L, "KLMNOPQRST"), (20L, "UVWXYZ")))
    val chunks = Fasta.toChunks(parsed, width = 8)
    val c1 = chunks.filter($"chr" === "chr1").orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(c1.toSeq == Seq((0, "ABCDEFGH"), (1, "IJKLMNOP"), (2, "QRSTUVWX"), (3, "YZ")))
    // fetch [5, 19) crosses two chunk borders
    val got = Fasta.getSequence(chunks, "chr1", 5L, 19L, width = 8)
      .collect().head.getString(1)
    assert(got == "FGHIJKLMNOPQRS")
    val got2 = Fasta.getSequence(chunks, "chr2", 2L, 6L, width = 8)
      .collect().head.getString(1)
    assert(got2 == "GTAC")
  }
}
