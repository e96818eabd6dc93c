package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZygosityFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def snv(ref: String, vn: String, chr: String, pos: Long, gender: String,
                  a: Int, c: Int, g: Int, t: Int) =
    Seq((ref, vn, chr, pos, gender, a, c, g, t))
      .toDF("ref", "var", "chr", "pos", "gender", "a", "c", "g", "t")
      .select(ZygosityFunctions.zygositySnv($"ref", $"var", $"chr", $"pos",
        $"gender", $"a", $"c", $"g", $"t").as("z"))
      .select("z.*").collect().head

  test("status ladder thresholds at 100 / 85 / below") {
    // all reads on the variant allele -> 100% -> homozygous
    val hom = snv("A", "C", "1", 1000L, "F", 0, 20, 0, 0)
    assert(hom.getAs[String]("zygosity_status") == "homozygous")
    assert(hom.getAs[Int]("zygosity_percent_read") == 100)
    // 17/20 = 85% -> possibly homozygous (>= 85 boundary)
    val poss = snv("A", "C", "1", 1000L, "F", 3, 17, 0, 0)
    assert(poss.getAs[String]("zygosity_status") == "possibly homozygous")
    // 50% -> heterozygous
    val het = snv("A", "C", "1", 1000L, "F", 10, 10, 0, 0)
    assert(het.getAs[String]("zygosity_status") == "heterozygous")
  }

  test("possible-error flag at the 15% boundary") {
    // 3/20 = 15% -> Y (<= 15)
    assert(snv("A", "C", "1", 1L, "F", 17, 3, 0, 0)
      .getAs[String]("zygosity_poss_error") == "Y")
    // 4/20 = 20% -> N
    assert(snv("A", "C", "1", 1L, "F", 16, 4, 0, 0)
      .getAs[String]("zygosity_poss_error") == "N")
  }

  test("male X outside PAR gets the hemizygous ladder; inside PAR stays diploid") {
    val outPar = snv("A", "C", "X", 50000000L, "M", 0, 20, 0, 0)
    assert(outPar.getAs[String]("zygosity_status") == "hemizygous")
    assert(outPar.getAs[String]("zygosity_in_pseudo") == "N")
    val inPar = snv("A", "C", "X", 1000000L, "M", 0, 20, 0, 0) // within [1, 2709520]
    assert(inPar.getAs[String]("zygosity_status") == "homozygous")
    assert(inPar.getAs[String]("zygosity_in_pseudo") == "Y")
    // female X is never hemizygous
    val female = snv("A", "C", "X", 50000000L, "F", 0, 20, 0, 0)
    assert(female.getAs[String]("zygosity_status") == "homozygous")
  }

  test("PAR boundary positions (build-36 X first interval)") {
    assert(snv("A", "C", "X", 2709520L, "M", 0, 9, 0, 0)
      .getAs[String]("zygosity_in_pseudo") == "Y")
    assert(snv("A", "C", "X", 2709521L, "M", 0, 9, 0, 0)
      .getAs[String]("zygosity_in_pseudo") == "N")
  }

  test("ref-allele flag and score") {
    val r = snv("A", "C", "1", 1L, "F", 5, 15, 0, 0)
    assert(r.getAs[String]("zygosity_ref_allele") == "Y")
    assert(r.getAs[Int]("score") == 15) // raw var-allele count
    assert(r.getAs[Int]("zygosity_num_allele") == 2)
    val r2 = snv("A", "C", "1", 1L, "F", 0, 15, 0, 0)
    assert(r2.getAs[String]("zygosity_ref_allele") == "N")
  }

  test("indel zygosity: percent from allele/read depth, score 0 when no allele reads") {
    val r = Seq((12, 16, "1", 1L, "F"))
      .toDF("ad", "rd", "chr", "pos", "gender")
      .select(ZygosityFunctions.zygosityIndel($"ad", $"rd", $"chr", $"pos", $"gender").as("z"))
      .select("z.*").collect().head
    assert(r.getAs[Int]("zygosity_percent_read") == 75)
    assert(r.getAs[String]("zygosity_status") == "heterozygous")
    assert(r.getAs[Int]("score") == 75)
    val zero = Seq((0, 16, "1", 1L, "F"))
      .toDF("ad", "rd", "chr", "pos", "gender")
      .select(ZygosityFunctions.zygosityIndel($"ad", $"rd", $"chr", $"pos", $"gender").as("z"))
      .select("z.*").collect().head
    assert(zero.getAs[Int]("score") == 0)
  }
}
