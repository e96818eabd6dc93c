package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DnaFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** JVM-side reference codon translation for cross-checking. */
  private def jvmTranslate(codon: String): String =
    DnaFunctions.CodonTable.getOrElse(codon.toUpperCase, "X")

  test("codon table is exhaustive and biologically correct on landmarks") {
    assert(DnaFunctions.CodonTable.size == 64)
    // canonical landmarks
    assert(jvmTranslate("ATG") == "M") // start
    assert(jvmTranslate("TAA") == "*" && jvmTranslate("TAG") == "*" && jvmTranslate("TGA") == "*")
    assert(jvmTranslate("TGG") == "W")
    assert(jvmTranslate("TTT") == "F" && jvmTranslate("AAA") == "K")
    assert(jvmTranslate("GGC") == "G" && jvmTranslate("CCG") == "P")
  }

  test("translateCodon matches the table for all 64 codons plus N-codons") {
    val bases = Seq("A", "C", "G", "T")
    val codons = (for { a <- bases; b <- bases; c <- bases } yield a + b + c) ++
      Seq("ANA", "NNN", "AC-")
    val got = codons.toDF("codon")
      .select($"codon", DnaFunctions.translateCodon($"codon").as("aa"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    codons.foreach { c => assert(got(c) == jvmTranslate(c), s"codon $c") }
  }

  test("translateDna walks codons and drops the tail") {
    val df = Seq("ATGTTTAAATAG", "ATGTT", "", "ATGCC X").toDF("dna")
      .select(DnaFunctions.translateDna($"dna").as("p"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == "MFK*")
    assert(out(1) == "M")   // trailing TT dropped
    assert(out(2) == "")
    assert(out(3) == "MX")  // "CC " is not a codon -> X
  }

  test("reverseComplement matches hand cases and is an involution") {
    val inputs = Seq("ACGT", "A", "GATTACA", "acgtn", "NNNN")
    val df = inputs.toDF("dna").select(
      $"dna",
      DnaFunctions.reverseComplement($"dna").as("rc"),
      DnaFunctions.reverseComplement(DnaFunctions.reverseComplement($"dna")).as("rc2"))
    val rows = df.collect()
    val rc = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rc("ACGT") == "ACGT")
    assert(rc("A") == "T")
    assert(rc("GATTACA") == "TGTAATC")
    assert(rc("acgtn") == "NACGT")
    rows.foreach(r => assert(r.getString(2) == r.getString(0).toUpperCase, s"involution ${r.getString(0)}"))
  }

  test("iupacExpand covers all 15 codes") {
    val expect = Map("A" -> "A", "C" -> "C", "G" -> "G", "T" -> "T",
      "R" -> "AG", "Y" -> "CT", "S" -> "GC", "W" -> "AT", "K" -> "GT",
      "M" -> "AC", "B" -> "CGT", "D" -> "AGT", "H" -> "ACT", "V" -> "ACG", "N" -> "ATCG")
    val got = expect.keys.toSeq.toDF("code")
      .select($"code", DnaFunctions.iupacExpand($"code").as("x"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    expect.foreach { case (k, v) => assert(got(k) == v, s"code $k") }
  }

  test("wrapLines wraps at the width and re-joins to the original") {
    val seq70 = "A" * 167
    val out = Seq(seq70).toDF("s")
      .select(DnaFunctions.wrapLines($"s", 70).as("w"))
      .collect().head.getString(0)
    val lines = out.split("\n")
    assert(lines.length == 3 && lines(0).length == 70 && lines(2).length == 27)
    assert(lines.mkString("") == seq70)
  }
}
