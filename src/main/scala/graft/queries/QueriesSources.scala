package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Cf2, Polyphen, Vcf}

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

  // ---------------------------------------------------------------- q80
  // S15+F12+J11: PolyPhen results loader (`PolyphenLoader.java:97-180`):
  // 55-col positional TSV, every value trimmed, swapped-AA rows
  // rejected, survivors paired with the run's .info file on the 4-part
  // key with duplicates consumed positionally in file order (the o_pos
  // fix, `changes.txt:41-43`). The fixture bakes monotone rsid /
  // variant_id so "file order" is a sortable column on both sides; the
  // row_number pairing then reproduces the reference's
  // first-match-consumed list walk exactly (including rn re-ranking
  // after rejected results and absent info lines shift the pairing).

  private val PolyphenPath = s"$FixtureDir/sample.polyphen"
  private val PolyphenInfoPath = s"$FixtureDir/sample.info"
  private val PolyphenRows = 500
  private val AAs = "ARNDCQEGHILKMFPSTWYV"

  /** Deterministic PolyPhen fixture: 500 result lines (every 11th has
    * its o_aa pair swapped → rejected; keys repeat with period 200 →
    * genuine positional-pairing work) + an .info file missing every
    * 13th line (→ unmatched results dropped, and the positional rank
    * of later duplicates shifts, which the oracle must reproduce). */
  private def writePolyphenFixture(): Unit = {
    val rf = new java.io.File(PolyphenPath)
    rf.getParentFile.mkdirs()
    val rw = new java.io.PrintWriter(rf)
    val iw = new java.io.PrintWriter(new java.io.File(PolyphenInfoPath))
    try {
      rw.println("#" + graft.sources.Polyphen.schema.fieldNames.mkString("\t"))
      iw.println("#" + graft.sources.Polyphen.infoSchema.fieldNames.mkString("\t"))
      var i = 0
      while (i < PolyphenRows) {
        val prot = "NP_" + (1000 + i % 40)
        val pos = (100 + (i % 25) * 3).toString
        val refAA = AAs.charAt(i % 20).toString
        val varAA = AAs.charAt((i + 7) % 20).toString
        val swapped = i % 11 == 0
        val (o1, o2) = if (swapped) (varAA, refAA) else (refAA, varAA)
        val pred = Seq("benign", "possibly damaging", "probably damaging")(i % 3)
        val prob = (i % 64).toDouble / 64.0 // binary-exact → exact sums
        val byName = Map(
          "o_acc" -> ("  " + prot), // space-padded: the reader must trim
          "o_pos" -> pos,
          "o_aa1" -> o1, "o_aa2" -> o2,
          "rsid" -> ("rs" + (500000 + i)), // monotone == file order
          "acc" -> prot, "pos" -> pos,
          "aa1" -> refAA, "aa2" -> varAA,
          "nt1" -> "A", "nt2" -> "G",
          "prediction" -> (pred + " "), // trailing pad: trim again
          "based_on" -> "alignment", "effect" -> ".",
          "pph2_class" -> (if (prob > 0.5) "deleterious" else "neutral"),
          "pph2_prob" -> prob.toString)
        rw.println(Polyphen.schema.fieldNames
          .map(n => byName.getOrElse(n, ".")).mkString("\t"))
        if (i % 13 != 0) {
          iw.println(Seq((9000000 + i).toString, "Gene" + (i % 30), prot,
            pos, refAA, varAA, if (i % 2 == 0) "+" else "-",
            (70000 + i % 50).toString).mkString("\t"))
        }
        i += 1
      }
    } finally { rw.close(); iw.close() }
  }

  private val polyphenOracle: String = {
    val rcols = Polyphen.schema.fieldNames
      .map(n => s"'$n':'VARCHAR'").mkString("{", ",", "}")
    val icols = Polyphen.infoSchema.fieldNames
      .map(n => s"'$n':'VARCHAR'").mkString("{", ",", "}")
    s"""WITH rraw AS (
       |  SELECT * FROM read_csv('$PolyphenPath', delim='$Tab', header=false,
       |    auto_detect=false, null_padding=true, columns=$rcols)
       |  WHERE o_acc NOT LIKE '#%'
       |), res AS (
       |  SELECT trim(o_acc) AS r_acc, trim(o_pos) AS r_pos,
       |         trim(o_aa1) AS r_aa1, trim(o_aa2) AS r_aa2,
       |         trim(rsid) AS rsid, trim(prediction) AS prediction,
       |         CAST(trim(pph2_prob) AS DOUBLE) AS pph2_prob
       |  FROM rraw
       |  WHERE NOT (trim(o_aa1) = trim(aa2) AND trim(o_aa2) = trim(aa1))
       |), rn_res AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY r_acc, r_pos, r_aa1, r_aa2 ORDER BY rsid) AS rn
       |  FROM res
       |), inf AS (
       |  SELECT CAST(variant_id AS BIGINT) AS variant_id, gene_symbol,
       |         protein_acc_id, i_pos, ref_aa, var_aa,
       |         row_number() OVER (
       |           PARTITION BY protein_acc_id, i_pos, ref_aa, var_aa
       |           ORDER BY CAST(variant_id AS BIGINT)) AS rn
       |  FROM read_csv('$PolyphenInfoPath', delim='$Tab', header=false,
       |    auto_detect=false, null_padding=true, columns=$icols)
       |  WHERE variant_id NOT LIKE '#%'
       |)
       |SELECT prediction, count(*) AS n,
       |  round(sum(pph2_prob), 6) AS sum_prob,
       |  CAST(count(DISTINCT gene_symbol) AS BIGINT) AS n_genes,
       |  CAST(sum(variant_id) AS BIGINT) AS sum_vid
       |FROM rn_res JOIN inf ON r_acc = protein_acc_id AND r_pos = i_pos
       |  AND r_aa1 = ref_aa AND r_aa2 = var_aa AND rn_res.rn = inf.rn
       |GROUP BY prediction ORDER BY prediction""".stripMargin
  }

  // ---------------------------------------------------------------- q83
  // S16: PolyPhen log scraper (`PolyphenFasta.readProteinAccIds:
  // 128-151`) — "ERROR: Unable to locate protein entry <acc> ..." lines
  // yield a distinct acc-id set, here joined back against the .info
  // file's protein ids to split known/unknown (the reference uses the
  // set to re-drive FASTA extraction for the missing ids).

  private val LogPath = s"$FixtureDir/polyphen_run.log"
  private val LogLines = 400

  private def writeLogFixture(): Unit = {
    val f = new java.io.File(LogPath)
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f)
    try {
      var i = 0
      while (i < LogLines) {
        val line = (i % 7) match {
          case 0 => s"ERROR: Unable to locate protein entry NP_${1000 + i % 60} for map key 372"
          case 1 => "ERROR: transcript mapping failed downstream"
          case 2 => "WARN: Unable to locate protein entry NP_9999 ignored"
          case _ => s"INFO: processed chunk $i"
        }
        w.println(line)
        i += 1
      }
    } finally w.close()
  }

  private val logOracle: String = {
    val icols = Polyphen.infoSchema.fieldNames
      .map(n => s"'$n':'VARCHAR'").mkString("{", ",", "}")
    s"""WITH lines AS (
       |  SELECT line FROM read_csv('$LogPath', delim='$Tab', header=false,
       |    auto_detect=false, columns={'line':'VARCHAR'})),
       |missing AS (
       |  SELECT DISTINCT acc AS protein_acc_id FROM (
       |    SELECT regexp_extract(line,
       |      '^ERROR: Unable to locate protein entry (\\S+) ', 1) AS acc
       |    FROM lines
       |    WHERE line LIKE 'ERROR: Unable to locate protein entry %')
       |  WHERE acc <> ''),
       |known AS (
       |  SELECT DISTINCT protein_acc_id
       |  FROM read_csv('$PolyphenInfoPath', delim='$Tab', header=false,
       |    auto_detect=false, null_padding=true, columns=$icols)
       |  WHERE variant_id NOT LIKE '#%')
       |SELECT (k.protein_acc_id IS NOT NULL) AS in_info,
       |  count(*) AS n_accs,
       |  min(m.protein_acc_id) AS first_acc,
       |  max(m.protein_acc_id) AS last_acc
       |FROM missing m LEFT JOIN known k ON m.protein_acc_id = k.protein_acc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin
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
      Some(cf2Oracle)),

    Q("q80_polyphen_load",
      (spark, dir) => {
        writePolyphenFixture()
        val res = Polyphen.read(spark, PolyphenPath)
          .filter(!Polyphen.swappedAA)
        val inf = Polyphen.readInfo(spark, PolyphenInfoPath)
        Polyphen.pairWithInfo(res, inf, col("rsid"), col("variant_id"))
          .groupBy(col("prediction"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("pph2_prob").cast("double")), 6).as("sum_prob"),
            countDistinct(col("gene_symbol")).as("n_genes"),
            sum(col("variant_id")).as("sum_vid"))
          .orderBy(col("prediction"))
      },
      Some(polyphenOracle)),

    Q("q83_log_scrape",
      (spark, dir) => {
        writePolyphenFixture()
        writeLogFixture()
        val missing = Polyphen.scrapeMissingProteins(spark, LogPath)
        val known = Polyphen.readInfo(spark, PolyphenInfoPath)
          .select(col("protein_acc_id")).distinct()
          .withColumn("known", lit(1))
        missing.join(known, Seq("protein_acc_id"), "left_outer")
          .groupBy(col("known").isNotNull.as("in_info"))
          .agg(count(lit(1)).as("n_accs"),
            min(col("protein_acc_id")).as("first_acc"),
            max(col("protein_acc_id")).as("last_acc"))
          .orderBy(col("in_info"))
      },
      Some(logOracle)))
}
