package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Cf2, Vcf}

/** File-format source queries — the reference pipeline's *front door*
  * (S1-S3/K1): real text files written to disk, read back through the
  * graft readers, and hash-compared against a DuckDB `read_csv` oracle
  * over the very same files.
  *
  * Fixture files live under a fixed path so the static oracle SQL can
  * reference them; each query (re)writes its fixture when invoked, so
  * the oracle — which the harness always runs *after* the Spark dump —
  * reads exactly what the reader read.
  */
object QueriesSources {

  /** Fixture root (inside the repo; harness runs on one machine). */
  val FixtureDir = "/root/repo/tmp/filegate"

  // ---------------------------------------------------------------- q78
  // S1/S2: VCF text reader (`VcfToCommonFormat2Converter.run:109-147`):
  // ## meta lines dropped, strain names from the #CHROM header row,
  // one output row per (line, strain) via posexplode.

  private val VcfStrains = Seq("BN", "SHR", "WKY", "F344")
  private val VcfGts = Array("0/0", "0/1", "1/1", "0/1", "./.")
  private val VcfPath = s"$FixtureDir/sample.vcf"
  private val VcfLines = 600

  /** Deterministic VCF fixture: pure function of the line index — the
    * file IS the input under test (the reference's VCFs arrive from
    * sequencing pipelines); generation is driver-side by design. */
  private def writeVcfFixture(): Unit = {
    val f = new java.io.File(VcfPath)
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f)
    try {
      w.println("##fileformat=VCFv4.2")
      w.println("##source=graft-filegate")
      w.println((Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
        "INFO", "FORMAT") ++ VcfStrains).mkString("\t"))
      val bases = "ACGT"
      var i = 0
      while (i < VcfLines) {
        val chrom = ((i % 5) + 1).toString
        val pos = 1000 + i * 13 + (i % 7)
        val id = "rs" + (100000 + i * 3)
        val ref = bases.charAt(i % 4).toString
        val alt = bases.charAt((i + 1 + i % 3) % 4).toString
        val qual = (i % 60).toString
        val filt = if (i % 10 == 0) "q10" else "PASS"
        val info = "DP=" + (20 + i % 80)
        val gts = VcfStrains.indices.map(s => VcfGts((i * 7 + s * 3) % 5))
        w.println((Seq(chrom, pos.toString, id, ref, alt, qual, filt, info,
          "GT") ++ gts).mkString("\t"))
        i += 1
      }
    } finally w.close()
  }

  /** A literal TAB character for DuckDB `delim` (triple-quoted Scala
    * strings keep `\t` as two chars, which DuckDB's sniffer rejects). */
  private val Tab = "\t"

  private val vcfOracle: String = {
    val cols = (1 to 13).map(i => s"'c$i':'VARCHAR'").mkString("{", ",", "}")
    val perStrain = VcfStrains.zipWithIndex.map { case (s, i) =>
      s"""SELECT c1 AS chrom, CAST(c2 AS BIGINT) AS pos, c8 AS info,
         |       '$s' AS strain, c${10 + i} AS gt FROM raw""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH raw AS (
       |  SELECT * FROM read_csv('$VcfPath', delim='$Tab', header=false,
       |    auto_detect=false, null_padding=true, columns=$cols)
       |  WHERE c1 NOT LIKE '#%'
       |), long AS (
       |$perStrain
       |)
       |SELECT chrom, strain,
       |  count(*) AS n_rows,
       |  CAST(sum(CASE WHEN gt <> './.' THEN 1 ELSE 0 END) AS BIGINT) AS n_called,
       |  CAST(sum(CASE WHEN gt = '0/1' THEN 1 ELSE 0 END) AS BIGINT) AS n_het,
       |  CAST(sum(CASE WHEN gt = '1/1' THEN 1 ELSE 0 END) AS BIGINT) AS n_hom_alt,
       |  CAST(sum(pos) AS BIGINT) AS sum_pos,
       |  CAST(sum(CAST(substr(info, 4) AS BIGINT)) AS BIGINT) AS sum_dp
       |FROM long GROUP BY chrom, strain ORDER BY chrom, strain""".stripMargin
  }

  // ---------------------------------------------------------------- q79
  // K1+S3: CF2 writer/reader round trip (16-col gzip TSV,
  // `CommonFormat2Writer.java:57`, positional read
  // `VariantLoad3.java:225-296`): rows derived from the synthetic
  // variants are written as .csv.gz through Cf2.write, read back with
  // the declared schema, and aggregated; the oracle reads the same
  // gzip files.

  private val Cf2Path = s"$FixtureDir/cf2"

  private val cf2Oracle: String = {
    val typed = Cf2.schema.fields.map { f =>
      val t = f.dataType.typeName match {
        case "long" => "BIGINT"
        case "integer" => "INTEGER"
        case _ => "VARCHAR"
      }
      s"'${f.name}':'$t'"
    }.mkString("{", ",", "}")
    s"""SELECT chromosome, count(*) AS n,
       |  CAST(sum(position) AS BIGINT) AS sum_pos,
       |  CAST(sum(total_depth) AS BIGINT) AS sum_depth,
       |  CAST(sum(reads_a + reads_c + reads_g + reads_t) AS BIGINT) AS sum_reads,
       |  CAST(count(DISTINCT rs_id) AS BIGINT) AS n_rs
       |FROM read_csv('$Cf2Path/*.csv.gz', delim='$Tab', header=false, columns=$typed)
       |GROUP BY chromosome ORDER BY chromosome""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("q78_vcf_file_read",
      (spark, dir) => {
        writeVcfFixture()
        Vcf.read(spark, VcfPath)
          .groupBy(col("chrom"), col("strain"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("gt") =!= "./.", 1L).otherwise(0L)).as("n_called"),
            sum(when(col("gt") === "0/1", 1L).otherwise(0L)).as("n_het"),
            sum(when(col("gt") === "1/1", 1L).otherwise(0L)).as("n_hom_alt"),
            sum(col("pos")).as("sum_pos"),
            sum(expr("CAST(substr(info, 4) AS BIGINT)")).as("sum_dp"))
          .orderBy(col("chrom"), col("strain"))
      },
      Some(vcfOracle)),

    Q("q79_cf2_roundtrip",
      (spark, dir) => {
        // SNV rows only: empty-string ref/var (ins/del) round-trip as
        // NULL through csv, which the depth aggregates don't touch but
        // DuckDB's reader also nulls — keep the fixture empty-free so
        // the gate tests the format machinery, not empty-vs-null lore
        val cf2 = Synthetic.variants(spark, dir)
          .filter(col("kind") >= 2)
          .selectExpr(
            "chromosome",
            "CAST(start_pos AS BIGINT) AS position",
            "ref_nuc", "var_nuc",
            "concat('rs', CAST(vid AS STRING)) AS rs_id",
            "CAST(count_a AS INT) AS reads_a",
            "CAST(count_c AS INT) AS reads_c",
            "CAST(count_g AS INT) AS reads_g",
            "CAST(count_t AS INT) AS reads_t",
            "CAST(total_depth AS INT) AS total_depth",
            "concat(chromosome, ':', CAST(start_pos AS STRING)) AS hgvs_name",
            "CAST(vid % 1000000 AS INT) AS rgd_id",
            "CAST(allele_depth AS INT) AS allele_depth",
            "CAST(allele_depth % 5 AS INT) AS allele_count",
            "CAST(read_depth AS INT) AS read_depth",
            "'N' AS padding_base")
        Cf2.write(cf2, Cf2Path, compression = "gzip")
        Cf2.read(spark, Cf2Path)
          .groupBy(col("chromosome"))
          .agg(count(lit(1)).as("n"),
            sum(col("position")).as("sum_pos"),
            sum(col("total_depth")).cast("long").as("sum_depth"),
            sum(col("reads_a") + col("reads_c") + col("reads_g") + col("reads_t"))
              .cast("long").as("sum_reads"),
            countDistinct(col("rs_id")).as("n_rs"))
          .orderBy(col("chromosome"))
      },
      Some(cf2Oracle)))
}
