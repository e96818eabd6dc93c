package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.DnaFunctions
import graft.sources.{Cf2, Fasta, Polyphen, Vcf}

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
  val FixtureDir = s"${Fixtures.scratchRoot}/filegate"

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
  private val Cf2FanPath = s"$FixtureDir/cf2_fanout"

  // q107 (K1 per-strain fan-out): unlike q79's oracle (which re-reads
  // the written .gz files to gate FORMAT interop), this oracle
  // reconstructs the per-strain expectation from the SOURCE rows — a
  // row fanned into the wrong strain directory, dropped by the
  // partitioned write, or corrupted in flight shifts a per-strain
  // aggregate and fails the hash.
  private val cf2FanoutOracle: String =
    s"""WITH variants AS (${Synthetic.variantsSql})
       |SELECT CASE CAST(sample_id % 3 AS INT)
       |    WHEN 0 THEN 'BN' WHEN 1 THEN 'SHR_OLA' ELSE 'WKY' END AS strain,
       |  count(*) AS n,
       |  CAST(sum(start_pos) AS BIGINT) AS sum_pos,
       |  CAST(sum(total_depth) AS BIGINT) AS sum_depth,
       |  CAST(sum(count_a + count_c + count_g + count_t) AS BIGINT) AS sum_reads,
       |  CAST(count(DISTINCT vid) AS BIGINT) AS n_rs
       |FROM variants WHERE kind >= 2
       |GROUP BY 1 ORDER BY 1""".stripMargin

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
       |FROM read_csv('$Cf2Path/*.csv.gz', delim='$Tab', header=false,
       |  auto_detect=false, columns=$typed)
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
          // every 17th o_pos is zero-padded: the pairing must normalize
          // positions numerically ('042' == '42'), as the reference's
          // Integer.parseInt round-trip does
          "o_pos" -> (if (i % 17 == 0) "0" + pos else pos),
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
       |  SELECT trim(o_acc) AS r_acc, TRY_CAST(trim(o_pos) AS BIGINT) AS r_pos,
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
       |         protein_acc_id, TRY_CAST(i_pos AS BIGINT) AS i_pos, ref_aa, var_aa,
       |         row_number() OVER (
       |           PARTITION BY protein_acc_id, TRY_CAST(i_pos AS BIGINT), ref_aa, var_aa
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
       |GROUP BY prediction
       |UNION ALL
       |SELECT '__unmatched' AS prediction, count(*) AS n,
       |  round(CAST(0 AS DOUBLE), 6) AS sum_prob,
       |  CAST(count(DISTINCT u.r_acc) AS BIGINT) AS n_genes,
       |  CAST(0 AS BIGINT) AS sum_vid
       |FROM (
       |  SELECT r.r_acc FROM rn_res r LEFT JOIN inf i
       |    ON r.r_acc = i.protein_acc_id AND r.r_pos = i.i_pos
       |    AND r.r_aa1 = i.ref_aa AND r.r_aa2 = i.var_aa AND r.rn = i.rn
       |  WHERE i.protein_acc_id IS NULL) u
       |ORDER BY prediction""".stripMargin
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

  // ---------------------------------------------------------------- q84
  // The reference's production flow chained end to end over ONE input
  // (`run_converter.sh` -> `run_varload.sh` -> `run_varpostprocessing.sh`,
  // SURVEY §3): a multi-sample/multi-allele VCF with indels is read
  // (S1), strains and alt alleles exploded with genotype filtering and
  // zygosity (X8, `VcfToCommonFormat2Converter.java:126-290`), the
  // shared padding base stripped and the variant typed
  // (`VariantLoad3.java:236-314`), distinct natural keys get dense ids
  // (J5/K4, `VariantProcessingBase.insertVariantRgdIds2`), genic status
  // comes from the exon interval join (`VariantLoad3.java:682-694`),
  // and SNVs run the full transcript/codon math of q82
  // (`VariantPostProcessing.java:157-551`). One aggregate; the DuckDB
  // oracle replays every stage over the same file + tables.

  private val ChainVcfPath = s"$FixtureDir/chain.vcf"
  private val ChainVcfLines = 800

  /** Deterministic chain fixture: shapes cycle SNV / multi-allele SNV /
    * deletion / insertion, genotypes cycle hom/het/missing (incl. 1/2
    * and 0/2 on the multi-allele lines), positions land in and out of
    * the synthetic exon bands. */
  private def writeChainVcfFixture(): Unit = {
    val f = new java.io.File(ChainVcfPath)
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f)
    try {
      w.println("##fileformat=VCFv4.2")
      w.println("##source=graft-chain")
      w.println((Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
        "INFO", "FORMAT") ++ VcfStrains).mkString("\t"))
      val bases = "ACGT"
      val gts4 = Array("0/0", "0/1", "1/1", "./.")
      val gts6 = Array("0/1", "1/1", "1/2", "0/2", "2/2", "./.")
      var i = 0
      while (i < ChainVcfLines) {
        val chrom = ((i % 5) + 1).toString
        val pos = 1000 + i * 9
        val b1 = bases.charAt(i % 4).toString
        val b2 = bases.charAt((i + 1 + i % 3) % 4).toString
        val b3 = bases.charAt((i + 3) % 4).toString
        val (ref, alt) = (i % 4) match {
          case 0 => (b1, b2)                              // SNV
          case 1 => (b1, bases.charAt((i % 4 + 1) % 4).toString + "," +
            bases.charAt((i % 4 + 2) % 4).toString)       // 2-allele SNV
          case 2 => (b1 + b3, b1)                         // deletion
          case _ => (b1, b1 + b3)                         // insertion
        }
        val gts = VcfStrains.indices.map { s =>
          if (i % 4 == 1) gts6((i * 7 + s * 3) % 6) else gts4((i * 7 + s * 3) % 4)
        }
        w.println((Seq(chrom, pos.toString, "rs" + (200000 + i), ref, alt,
          (i % 60).toString, "PASS", "DP=" + (20 + i % 80), "GT") ++ gts)
          .mkString("\t"))
        i += 1
      }
    } finally w.close()
  }

  private val chainOracle: String = {
    val cols = (1 to 13).map(i => s"'c$i':'VARCHAR'").mkString("{", ",", "}")
    val perStrain = VcfStrains.zipWithIndex.map { case (s, i) =>
      s"""SELECT c1 AS chrom, CAST(c2 AS BIGINT) AS pos, c4 AS ref,
         |       c5 AS alt, c${10 + i} AS gt FROM raw""".stripMargin
    }.mkString("\nUNION ALL\n")
    val revcomp = (c: String) => s"reverse(translate(upper($c), 'ACGT', 'TGCA'))"
    s"""WITH raw AS (
       |  SELECT * FROM read_csv('$ChainVcfPath', delim='$Tab', header=false,
       |    auto_detect=false, null_padding=true, columns=$cols)
       |  WHERE c1 NOT LIKE '#%'
       |), long AS (
       |$perStrain
       |), al AS (
       |  SELECT l.chrom, l.pos, l.ref, l.gt,
       |    string_split(l.alt, ',')[u.a_idx] AS va
       |  FROM long l, LATERAL (
       |    SELECT DISTINCT TRY_CAST(x AS INT) AS a_idx
       |    FROM unnest(string_split(l.gt, '/')) t(x)
       |    WHERE TRY_CAST(x AS INT) > 0) u
       |), conv AS (
       |  SELECT chrom AS chromosome,
       |    CASE WHEN string_split(gt, '/')[1] = string_split(gt, '/')[2]
       |         THEN 'hom' ELSE 'het' END AS zyg,
       |    CASE WHEN share THEN substr(ref, 2) ELSE ref END AS ref_nuc,
       |    CASE WHEN share THEN substr(va, 2) ELSE va END AS var_nuc,
       |    CASE WHEN share THEN pos + 1 ELSE pos END AS position
       |  FROM (SELECT *, (length(ref) > 1 OR length(va) > 1)
       |          AND substr(ref, 1, 1) = substr(va, 1, 1) AS share FROM al)
       |), vars AS (
       |  SELECT chromosome, position, ref_nuc, var_nuc,
       |    max(CASE WHEN ref_nuc = '' AND var_nuc <> '' THEN 'ins'
       |             WHEN var_nuc = '' AND ref_nuc <> '' THEN 'del'
       |             WHEN length(ref_nuc) = 1 AND length(var_nuc) = 1 THEN 'snv'
       |             WHEN length(ref_nuc) = length(var_nuc) THEN 'mnv'
       |             ELSE 'delins' END) AS variant_type,
       |    count(*) AS n_samples,
       |    sum(CASE WHEN zyg = 'het' THEN 1 ELSE 0 END) AS n_het,
       |    row_number() OVER (
       |      ORDER BY chromosome, position, ref_nuc, var_nuc) AS assigned_id
       |  FROM conv GROUP BY 1, 2, 3, 4
       |), chrs AS (SELECT n_nationkey + 1 AS c FROM nation WHERE n_nationkey < 5),
       |ln AS (
       |  SELECT c, i, string_agg(ch, '' ORDER BY j) AS line
       |  FROM (SELECT c, i, j, ['A','C','G','T'][(c*7 + i*3 + j) % 4 + 1] AS ch
       |        FROM chrs, generate_series(1, 225) s(i), generate_series(1, 40) t(j))
       |  GROUP BY c, i),
       |chrseq AS (SELECT c, string_agg(line, '' ORDER BY i) AS seq FROM ln GROUP BY c),
       |t AS (
       |  SELECT p_partkey AS tid, CAST(p_partkey % 2 + 2 AS INT) AS n_exons,
       |    CASE WHEN p_partkey % 2 = 1 THEN '-' ELSE '+' END AS strand,
       |    (p_partkey % 25) + 1 AS chrn
       |  FROM part WHERE p_partkey % 25 < 5),
       |ex AS (
       |  SELECT tid, n_exons, strand, chrn, exon_idx,
       |    CAST(37 + exon_idx * 2500 + (tid * 53) % 2300 AS BIGINT) AS e_start,
       |    CAST(24 + (tid * 7 + exon_idx * 13) % 33 AS INT) AS e_len
       |  FROM t, LATERAL (SELECT unnest(generate_series(0, n_exons - 1)) AS exon_idx)),
       |exd AS (
       |  SELECT ex.*, e_start + e_len - 1 AS e_stop,
       |    substr(cs.seq, CAST(e_start AS INT), e_len) AS dna,
       |    CAST(coalesce(sum(e_len) OVER (PARTITION BY tid ORDER BY exon_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior_len
       |  FROM ex JOIN chrseq cs ON cs.c = ex.chrn),
       |cds AS (SELECT tid, strand, string_agg(dna, '' ORDER BY exon_idx) AS cds
       |        FROM exd GROUP BY tid, strand),
       |allhits AS (
       |  SELECT v.assigned_id, v.variant_type, v.var_nuc, e.tid,
       |    e.prior_len + (v.position - e.e_start) + 1 AS rel_pos
       |  FROM vars v JOIN exd e ON CAST(e.chrn AS VARCHAR) = v.chromosome
       |    AND v.position BETWEEN e.e_start AND e.e_stop),
       |genic AS (SELECT DISTINCT assigned_id FROM allhits),
       |asm AS (
       |  SELECT h.assigned_id, h.tid, c.strand, c.cds, h.rel_pos,
       |    substr(c.cds, 1, CAST(h.rel_pos - 1 AS INT)) || h.var_nuc
       |      || substr(c.cds, CAST(h.rel_pos + 1 AS INT)) AS var_cds
       |  FROM allhits h JOIN cds c ON c.tid = h.tid
       |  WHERE h.variant_type = 'snv'),
       |ori AS (
       |  SELECT assigned_id, tid,
       |    CASE WHEN strand = '-' THEN ${revcomp("cds")} ELSE cds END AS cds2,
       |    CASE WHEN strand = '-' THEN ${revcomp("var_cds")} ELSE var_cds END AS var_cds2,
       |    CASE WHEN strand = '-' THEN length(cds) - rel_pos + 1 ELSE rel_pos END AS rel2
       |  FROM asm),
       |fin AS (
       |  SELECT *, CASE WHEN rel2 > 3 * (length(cds2) // 3) THEN 'T' ELSE 'F' END AS triplet_error,
       |    CASE WHEN rel2 > 3 * (length(cds2) // 3) THEN 0 ELSE (rel2 + 2) // 3 END AS aa_pos
       |  FROM ori),
       |aa AS (
       |  SELECT assigned_id, tid, CAST(aa_pos AS BIGINT) AS aa_pos, triplet_error,
       |    CASE WHEN triplet_error = 'T' THEN 'skipped'
       |         ELSE ${QueriesGenomic.codonCaseSql("substr(cds2, CAST(3 * aa_pos - 2 AS INT), 3)")} END AS ref_aa,
       |    CASE WHEN triplet_error = 'T' THEN 'skipped'
       |         ELSE ${QueriesGenomic.codonCaseSql("substr(var_cds2, CAST(3 * aa_pos - 2 AS INT), 3)")} END AS var_aa
       |  FROM fin),
       |aa2 AS (
       |  SELECT assigned_id, tid, aa_pos,
       |    CASE WHEN triplet_error = 'T' THEN 'skipped'
       |         WHEN ref_aa = 'X' OR var_aa = 'X' THEN 'unassignable'
       |         WHEN ref_aa = var_aa THEN 'synonymous'
       |         ELSE 'nonsynonymous' END AS syn_status
       |  FROM aa),
       |base AS (
       |  SELECT v.variant_type,
       |    CASE WHEN g.assigned_id IS NOT NULL THEN 'GENIC' ELSE 'INTERGENIC' END AS genic_status,
       |    coalesce(a.syn_status, 'none') AS syn_status,
       |    v.assigned_id, v.n_samples, v.n_het, a.aa_pos
       |  FROM vars v
       |  LEFT JOIN genic g ON g.assigned_id = v.assigned_id
       |  LEFT JOIN aa2 a ON a.assigned_id = v.assigned_id)
       |SELECT variant_type, genic_status, syn_status,
       |  count(*) AS cnt,
       |  CAST(count(DISTINCT assigned_id) AS BIGINT) AS n_vars,
       |  CAST(sum(assigned_id) AS BIGINT) AS sum_id,
       |  CAST(sum(n_samples) AS BIGINT) AS sum_samples,
       |  CAST(sum(n_het) AS BIGINT) AS sum_het,
       |  CAST(coalesce(sum(aa_pos), 0) AS BIGINT) AS sum_aa_pos
       |FROM base GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  // ---------------------------------------------------------------- q85
  // K6/O1: sorted VCF writer (`ClinVar2Vcf.sortInMemory:148-202` +
  // `writeVcfLine:270-310` — the reference's only ordered file sink:
  // whole-file in-memory sort by chr asc, numeric pos, case-insensitive
  // id, header block on top). Gate: Vcf.writeSorted produces the file;
  // Spark reads it back in line order (zipWithIndex — deterministic for
  // text input splits); the oracle reconstructs the EXPECTED byte
  // content independently from the same synthetic rows. Full-content
  // hash equality fails on any sort, tie-break, header-placement or
  // formatting break. Mixed-case ids + (chr,pos) collisions make the
  // case-insensitive tie-break load-bearing.

  private val SortedVcfPath = s"$FixtureDir/sorted_vcf"
  private val SortedVcfHeaders = Seq(
    "##fileformat=VCFv4.2",
    "##source=graft-sortgate",
    Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO").mkString("\t"))

  private val sortedVcfOracle: String = {
    val headerExpr = SortedVcfHeaders
      .map(h => "'" + h.replace("\t", "' || chr(9) || '") + "'")
      .mkString(" || chr(10) || ")
    s"""WITH v AS (SELECT * FROM (${Synthetic.variantsSql}) WHERE kind >= 2),
       |lines AS (
       |  SELECT chromosome AS chrom,
       |    CAST(start_pos % 1000 + 1 AS BIGINT) AS pos,
       |    (CASE WHEN vid % 2 = 0 THEN 'rcv' ELSE 'RCV' END)
       |      || CAST(vid AS VARCHAR) AS id,
       |    ref_nuc AS ref, var_nuc AS var
       |  FROM v),
       |data AS (
       |  SELECT chrom || chr(9) || CAST(pos AS VARCHAR) || chr(9) || id
       |      || chr(9) || ref || chr(9) || var || chr(9) || '.' || chr(9)
       |      || '.' || chr(9) || 'SRC=graft' AS line,
       |    chrom, pos, lower(id) AS lid
       |  FROM lines)
       |SELECT $headerExpr || chr(10)
       |    || string_agg(line, chr(10) ORDER BY chrom, pos, lid) AS content,
       |  count(*) + ${SortedVcfHeaders.size} AS n_lines
       |FROM data""".stripMargin
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

    // K1's per-strain fan-out: the reference converter keeps one open
    // CF2 writer per strain and routes each line by strain name
    // (`VcfToCommonFormat2Converter.getOutputFile:393-405`). Spark-first
    // that's one partitioned write — `partitionBy(strain)` fans the
    // frame into strain=<name>/ directories in a single pass (no
    // per-strain job, no open-file map bounded by one JVM). The gate
    // reads EACH strain directory back independently, tags rows with
    // the directory literal, and compares per-strain aggregates against
    // a source-side reconstruction. Directory naming: Spark encodes the
    // partition VALUE in the path; the reference's '/'→'_' filename
    // mangling is unnecessary here because the fixture strains carry no
    // separator (documented deviation — path escaping, not semantics).
    Q("q107_cf2_fanout",
      (spark, dir) => {
        val strains = Seq("BN", "SHR_OLA", "WKY")
        val cf2 = Synthetic.variants(spark, dir)
          .filter(col("kind") >= 2) // SNVs: empty-string-free fixture (q79's rule)
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
            "'N' AS padding_base",
            "CASE CAST(sample_id % 3 AS INT) WHEN 0 THEN 'BN' " +
              "WHEN 1 THEN 'SHR_OLA' ELSE 'WKY' END AS strain")
        Cf2.write(cf2, Cf2FanPath, partitionBy = Seq("strain"),
          compression = "gzip")
        strains.map { s =>
          Cf2.read(spark, s"$Cf2FanPath/strain=$s")
            .withColumn("strain", lit(s))
        }.reduce(_ unionByName _)
          .groupBy(col("strain"))
          .agg(count(lit(1)).as("n"),
            sum(col("position")).as("sum_pos"),
            sum(col("total_depth")).cast("long").as("sum_depth"),
            sum(col("reads_a") + col("reads_c") + col("reads_g") + col("reads_t"))
              .cast("long").as("sum_reads"),
            countDistinct(col("rs_id")).as("n_rs"))
          .orderBy(col("strain"))
      },
      Some(cf2FanoutOracle)),

    Q("q80_polyphen_load",
      (spark, dir) => {
        writePolyphenFixture()
        val res = Polyphen.read(spark, PolyphenPath)
          .filter(!Polyphen.swappedAA)
        val inf = Polyphen.readInfo(spark, PolyphenInfoPath)
        val matched = Polyphen.pairWithInfo(res, inf, col("rsid"), col("variant_id"))
          .groupBy(col("prediction"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("pph2_prob").cast("double")), 6).as("sum_prob"),
            countDistinct(col("gene_symbol")).as("n_genes"),
            sum(col("variant_id")).as("sum_vid"))
        // K9 QC row: the reference counts results that pair with no
        // info line as errors (`PolyphenLoader.java:216-230`)
        val qc = Polyphen.unmatchedResults(res, inf, col("rsid"), col("variant_id"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("o_acc")).as("n_genes"))
          .select(lit("__unmatched").as("prediction"), col("n"),
            lit(0.0).as("sum_prob"), col("n_genes"), lit(0L).as("sum_vid"))
        matched.unionByName(qc).orderBy(col("prediction"))
      },
      Some(polyphenOracle)),

    Q("q85_vcf_sorted_write",
      (spark, dir) => {
        import spark.implicits._
        val lines = Synthetic.variants(spark, dir)
          .filter(col("kind") >= 2)
          .select(col("chromosome").as("chrom"),
            (col("start_pos") % 1000 + 1).cast("long").as("pos"),
            concat(when(col("vid") % 2 === 0, "rcv").otherwise("RCV"),
              col("vid").cast("string")).as("id"),
            col("ref_nuc").as("ref"), col("var_nuc").as("var"))
          .withColumn("line", concat_ws("\t",
            col("chrom"), col("pos").cast("string"), col("id"), col("ref"),
            col("var"), lit("."), lit("."), lit("SRC=graft")))
        Vcf.writeSorted(spark, lines, SortedVcfHeaders, SortedVcfPath)
        // read the PRODUCED file back in physical line order
        // (zipWithIndex: splits ordered by offset, lines by position)
        val read = spark.sparkContext.textFile(SortedVcfPath)
          .zipWithIndex.toDF("line", "idx")
        read.agg(
          array_join(transform(
            sort_array(collect_list(struct(col("idx"), col("line")))),
            x => x("line")), "\n").as("content"),
          count(lit(1)).as("n_lines"))
      },
      Some(sortedVcfOracle)),

    Q("q84_pipeline_chain",
      (spark, dir) => {
        writeChainVcfFixture()
        val W = 256
        val bases = typedlit(Seq("A", "C", "G", "T"))
        // ---- convert (S1/X8/F2): strain + alt-allele explode, zygosity,
        // padding-base strip, variant typing
        val gtParts = split(col("gt"), "/")
        val cf2 = Vcf.read(spark, ChainVcfPath)
          .withColumn("a_idx", explode(array_distinct(expr(
            "filter(transform(split(gt, '/'), x -> try_cast(x AS INT))," +
              " x -> x IS NOT NULL AND x > 0)"))))
          .withColumn("va", element_at(split(col("alt"), ","), col("a_idx")))
          .withColumn("zyg", when(element_at(gtParts, 1) === element_at(gtParts, 2),
            "hom").otherwise("het"))
          .withColumn("share",
            (length(col("ref")) > 1 || length(col("va")) > 1) &&
              substring(col("ref"), 1, 1) === substring(col("va"), 1, 1))
          .withColumn("ref_nuc",
            when(col("share"), expr("substring(ref, 2)")).otherwise(col("ref")))
          .withColumn("var_nuc",
            when(col("share"), expr("substring(va, 2)")).otherwise(col("va")))
          .withColumn("position",
            when(col("share"), col("pos") + 1).otherwise(col("pos")))
          .withColumn("variant_type",
            when(col("ref_nuc") === "" && col("var_nuc") =!= "", "ins")
              .when(col("var_nuc") === "" && col("ref_nuc") =!= "", "del")
              .when(length(col("ref_nuc")) === 1 && length(col("var_nuc")) === 1, "snv")
              .when(length(col("ref_nuc")) === length(col("var_nuc")), "mnv")
              .otherwise("delins"))
          .withColumnRenamed("chrom", "chromosome")
        // ---- load (J5/K3/K4): dedup to VARIANT rows + dense ids
        // (assignDense materializes internally; downstream consumers
        // read its checkpointed blocks, not the VCF parse)
        val keys = Seq("chromosome", "position", "ref_nuc", "var_nuc")
        val vars = graft.operators.IdAssign.assignDense(
          cf2.groupBy(keys.map(col): _*)
            .agg(max(col("variant_type")).as("variant_type"),
              count(lit(1)).as("n_samples"),
              sum(when(col("zyg") === "het", 1L).otherwise(0L)).as("n_het")),
          keys, "assigned_id")
        // ---- post-process inputs: genome chunk table + exon DNA
        // (5 chromosomes x 9000 bp; same shapes as q82)
        val chrs = table(spark, dir, "nation")
          .filter(col("n_nationkey") < 5)
          .select((col("n_nationkey") + 1).as("c"))
        val headers = chrs.select((col("c") * 100000).as("line_id"),
          concat(lit(">"), col("c")).as("line"))
        val seqLines = chrs.withColumn("i", explode(sequence(lit(1), lit(225))))
          .select((col("c") * 100000 + col("i")).as("line_id"),
            array_join(transform(sequence(lit(1), lit(40)),
              j => element_at(bases,
                ((col("c") * 7 + col("i") * 3 + j) % 4 + 1).cast("int"))), "").as("line"))
        val chunks = Fasta.toChunks(
          Fasta.parseLines(headers.unionByName(seqLines)), width = W)
        val t = table(spark, dir, "part")
          .filter(col("p_partkey") % 25 < 5)
          .select(col("p_partkey").as("tid"),
            (col("p_partkey") % 2 + 2).cast("int").as("n_exons"),
            when(col("p_partkey") % 2 === 1, "-").otherwise("+").as("strand"),
            (col("p_partkey") % 25 + 1).cast("string").as("chr"))
        val ex = t.withColumn("exon_idx", explode(sequence(lit(0), col("n_exons") - 1)))
          .withColumn("e_start",
            (lit(37) + col("exon_idx") * 2500 + (col("tid") * 53) % 2300).cast("long"))
          .withColumn("e_len", (lit(24) + (col("tid") * 7 + col("exon_idx") * 13) % 33).cast("int"))
          .withColumn("e_stop", col("e_start") + col("e_len") - 1)
        val pieces = ex
          .withColumn("from0", col("e_start") - 1)
          .withColumn("upto0", col("e_stop"))
          .withColumn("chunk_idx", explode(sequence(
            (col("from0") / W).cast("int"), ((col("upto0") - 1) / W).cast("int"))))
          .join(chunks, Seq("chr", "chunk_idx"))
          .withColumn("cbase", col("chunk_idx").cast("long") * W)
          .withColumn("cut_from", greatest(col("cbase"), col("from0")) - col("cbase"))
          .withColumn("cut_upto", least(col("cbase") + W, col("upto0")) - col("cbase"))
          .withColumn("piece",
            expr("substring(seq, CAST(cut_from + 1 AS INT), CAST(cut_upto - cut_from AS INT))"))
        val wp = Window.partitionBy(col("tid")).orderBy(col("exon_idx"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val exd = pieces
          .groupBy(col("tid"), col("exon_idx"), col("chr"), col("n_exons"),
            col("strand"), col("e_start"), col("e_stop"), col("e_len"))
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("chunk_idx"), col("piece")))),
            x => x("piece")), "").as("dna"))
          .withColumn("prior_len", coalesce(sum(col("e_len")).over(wp), lit(0)).cast("long"))
          // consumed twice (cds + the variant interval join)
          .localCheckpoint(true)
        val cds = exd.groupBy(col("tid"), col("strand"))
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("exon_idx"), col("dna")))),
            x => x("dna")), "").as("cds"))
        // ---- genic status + transcript hits from ONE interval join
        val allHits = graft.operators.RangeJoin.pointInInterval(
            vars.select(col("assigned_id"), col("chromosome"), col("position"),
              col("variant_type"), col("var_nuc")),
            exd.drop("dna"), Seq("chromosome"), Seq("chr"),
            "position", "e_start", "e_stop", binSize = 1024L)
          .withColumn("rel_pos", col("prior_len") + (col("position") - col("e_start")) + 1)
          .select(col("assigned_id"), col("variant_type"), col("var_nuc"),
            col("tid"), col("rel_pos"))
          // consumed twice (genic existence + SNV codon math)
          .localCheckpoint(true)
        val genic = allHits.select(col("assigned_id")).distinct()
          .withColumn("genic_status", lit("GENIC"))
        // ---- SNV codon math (codon-local, as q82)
        val aa = allHits.filter(col("variant_type") === "snv")
          .join(cds, "tid")
          .withColumn("cds_len", length(col("cds")))
          .withColumn("rel2", when(col("strand") === "-",
            col("cds_len") - col("rel_pos") + 1).otherwise(col("rel_pos")))
          .withColumn("trunc_len", expr("3 * (cds_len DIV 3)"))
          .withColumn("triplet_error", when(col("rel2") > col("trunc_len"), "T").otherwise("F"))
          .withColumn("aa_pos",
            when(col("triplet_error") === "T", 0L)
              .otherwise(expr("CAST((rel2 + 2) DIV 3 AS BIGINT)")))
          .withColumn("ref_codon",
            when(col("triplet_error") === "T", lit(""))
              .when(col("strand") === "-", DnaFunctions.reverseComplement(
                expr("substring(cds, CAST(cds_len - 3 * aa_pos + 1 AS INT), 3)")))
              .otherwise(expr("substring(cds, CAST(3 * aa_pos - 2 AS INT), 3)")))
          .withColumn("var_codon",
            when(col("triplet_error") === "T", lit(""))
              .otherwise(overlay(col("ref_codon"),
                when(col("strand") === "-",
                  DnaFunctions.reverseComplement(col("var_nuc")))
                  .otherwise(col("var_nuc")),
                (col("rel2") - col("aa_pos") * 3 + 3).cast("int"))))
          .withColumn("ref_aa",
            when(col("triplet_error") === "T", "skipped")
              .otherwise(DnaFunctions.translateCodon(col("ref_codon"))))
          .withColumn("var_aa",
            when(col("triplet_error") === "T", "skipped")
              .otherwise(DnaFunctions.translateCodon(col("var_codon"))))
          .withColumn("syn_status",
            when(col("triplet_error") === "T", "skipped")
              .otherwise(graft.functions.VariantFunctions.synStatus(
                col("ref_aa"), col("var_aa"))))
          .select(col("assigned_id"), col("tid"), col("aa_pos"), col("syn_status"))
        // ---- final: variant rows fanned out per transcript hit
        vars
          .join(genic, Seq("assigned_id"), "left_outer")
          .withColumn("genic_status", coalesce(col("genic_status"), lit("INTERGENIC")))
          .join(aa, Seq("assigned_id"), "left_outer")
          .groupBy(col("variant_type"), col("genic_status"),
            coalesce(col("syn_status"), lit("none")).as("syn_status"))
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("assigned_id")).as("n_vars"),
            sum(col("assigned_id")).as("sum_id"),
            sum(col("n_samples")).as("sum_samples"),
            sum(col("n_het")).as("sum_het"),
            coalesce(sum(col("aa_pos")), lit(0L)).as("sum_aa_pos"))
          .orderBy(col("variant_type"), col("genic_status"), col("syn_status"))
      },
      Some(chainOracle)),

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
      Some(logOracle)),

    // ---------------------------------------------------------------- q87
    // K10: the audit sink through the gate. The reference appends one
    // SYSTEM_LOG row per pipeline event with the event's record count
    // (`VariantProcessingBase.insertSystemLogMessage:64-75`, called from
    // each run_*.sh stage). Here three stage events log their counts —
    // the counts are data-derived (the synthetic variants table), so a
    // broken sink OR a broken count breaks the hash. The scalar
    // `.count()`s are the audited aggregates themselves (the reference
    // logs exactly such counts); the audit dir is cleared per run so
    // the append-mode sink yields a deterministic table. event_date is
    // excluded from the gate (wall-clock, like the reference's SYSDATE).
    Q("q87_audit_log",
      (spark, dir) => {
        val path = s"$FixtureDir/audit_log"
        val d = new java.io.File(path)
        if (d.exists()) {
          d.listFiles().foreach(_.delete()); d.delete()
        }
        val v = Synthetic.variants(spark, dir)
        val converted = v.count()
        val loaded = v.select(col("chromosome"), col("start_pos"),
          col("ref_nuc"), col("var_nuc")).distinct().count()
        val snvs = v.filter(col("kind") >= 2).count()
        graft.sources.Audit.logMessage(spark, path,
          "vcf-converter", "rows converted", converted.toDouble)
        graft.sources.Audit.logMessage(spark, path,
          "variant-loader", "distinct variants loaded", loaded.toDouble)
        graft.sources.Audit.logMessage(spark, path,
          "variant-postprocessing", "snv rows annotated", snvs.toDouble)
        graft.sources.Audit.read(spark, path)
          .select(col("system_component"), col("log_level"),
            col("string_value"), col("float_value").cast("long").as("n"))
          .orderBy(col("system_component"))
      },
      Some {
        s"""WITH v AS (${Synthetic.variantsSql})
           |SELECT * FROM (
           |  SELECT 'vcf-converter' AS system_component, 'Info' AS log_level,
           |    'rows converted' AS string_value, count(*) AS n FROM v
           |  UNION ALL
           |  SELECT 'variant-loader', 'Info', 'distinct variants loaded',
           |    count(*) FROM (SELECT DISTINCT chromosome, start_pos,
           |      ref_nuc, var_nuc FROM v)
           |  UNION ALL
           |  SELECT 'variant-postprocessing', 'Info', 'snv rows annotated',
           |    count(*) FROM v WHERE kind >= 2)
           |ORDER BY system_component""".stripMargin
      }),

    // ---------------------------------------------------------------- q89
    // K7/X15: the PolyPhen protein-FASTA input writer
    // (`Polyphen.writeFastaFile:357-372` — 70-col wrapped sequence under
    // a `>acc` header, one file, records in accession order) through the
    // gate. Round trip: Polyphen.writeFasta produces the file from
    // synthetic proteins; the Fasta source parses it back; sequences are
    // reassembled from the wrapped lines. The oracle reconstructs the
    // EXPECTED per-protein stats and full sequence independently from
    // the same `part`-derived derivation, so a wrap, ordering, header or
    // reassembly break fails the hash. Line-length stats make the
    // 70-col contract load-bearing (max body line must be exactly 70
    // for any sequence longer than the width).
    Q("q89_polyphen_fasta_write",
      (spark, dir) => {
        import spark.implicits._
        val aa = "ARNDCQEGHILKMFPSTWYV"
        val path = s"$FixtureDir/polyphen_fasta"
        val prot = table(spark, dir, "part")
          .filter(col("p_partkey") % 20 === 0)
          .selectExpr(
            "concat('NP_', lpad(CAST(p_partkey AS STRING), 6, '0')) AS acc",
            s"""array_join(transform(
               |  sequence(1, CAST(40 + p_partkey % 150 AS INT)),
               |  j -> substr('$aa', CAST((p_partkey * 7 + j * 11) % 20 AS INT) + 1, 1)),
               |  '') AS seq""".stripMargin)
        Polyphen.writeFasta(spark, prot, path)
        val lines = spark.sparkContext.textFile(path)
          .zipWithIndex.toDF("line", "line_id")
        Fasta.parseLines(lines)
          .groupBy(col("chr").as("acc"))
          .agg(count(lit(1)).as("n_body_lines"),
            max(length(col("seq"))).cast("long").as("max_line_len"),
            array_join(transform(
              sort_array(collect_list(struct(col("start_off"), col("seq")))),
              x => x("seq")), "").as("sequence"))
          .withColumn("seq_len", length(col("sequence")).cast("long"))
          .orderBy(col("acc"))
      },
      Some {
        val aa = "ARNDCQEGHILKMFPSTWYV"
        s"""WITH prot AS (
           |  SELECT 'NP_' || lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS acc,
           |    array_to_string([substr('$aa',
           |        CAST((p_partkey * 7 + j * 11) % 20 AS INT) + 1, 1)
           |      FOR j IN generate_series(1, CAST(40 + p_partkey % 150 AS INT))],
           |      '') AS seq
           |  FROM part WHERE p_partkey % 20 = 0)
           |SELECT acc,
           |  CAST((length(seq) + 69) // 70 AS BIGINT) AS n_body_lines,
           |  CAST(least(length(seq), 70) AS BIGINT) AS max_line_len,
           |  seq AS sequence,
           |  CAST(length(seq) AS BIGINT) AS seq_len
           |FROM prot ORDER BY acc""".stripMargin
      }),

    // ---------------------------------------------------------------- q69
    // Gzipped JSONL round trip — the corpus interchange format (every
    // public text dump ships as *.jsonl.gz). The documents table is
    // written as compressed newline-delimited JSON with a NESTED
    // metadata struct, read back through an explicit schema (never
    // inferSchema at 100 TB — schema inference is a full extra pass),
    // and aggregated; the DuckDB oracle parses the very same .gz files
    // with its own JSON reader, so a dropped row/field, mangled nested
    // struct, type drift, or string-escaping break diverges the hash.
    Q("q69_jsonl_roundtrip",
      (spark, dir) => {
        val path = s"$FixtureDir/docs_jsonl"
        table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"),
            struct(col("source"), col("n_chars")).as("meta"))
          .write.mode("overwrite").option("compression", "gzip").json(path)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, lang STRING, text STRING, " +
            "meta STRUCT<source: STRING, n_chars: BIGINT>")
        spark.read.schema(schema).json(path)
          .groupBy(col("lang"), col("meta.source").as("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("doc_id")).as("n_ids"),
            sum(col("meta.n_chars")).as("sum_meta_chars"),
            sum(length(col("text")).cast("long")).as("sum_text_chars"))
          .orderBy(col("lang"), col("source"))
      },
      Some(
        s"""SELECT lang, meta.source AS source, count(*) AS n_docs,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
           |  CAST(sum(meta.n_chars) AS BIGINT) AS sum_meta_chars,
           |  CAST(sum(length(text)) AS BIGINT) AS sum_text_chars
           |FROM read_json('$FixtureDir/docs_jsonl/*.json.gz',
           |  format='newline_delimited',
           |  columns={'doc_id':'BIGINT','lang':'VARCHAR','text':'VARCHAR',
           |           'meta':'STRUCT(source VARCHAR, n_chars BIGINT)'})
           |GROUP BY lang, meta.source ORDER BY lang, source""".stripMargin)),

    // ---------------------------------------------------------------- q97
    // Partition-pruned layout: the 100 TB table layout primitive. The
    // corpus is written hive-partitioned by `lang`
    // (`partitionBy(lang)`) and read back with a partition-key filter —
    // Catalyst prunes the scan to the matching directories BEFORE
    // listing file contents (`PartitionFilters` on the scan; at scale,
    // the difference between touching 2/5 of the corpus and all of it).
    // The gate's oracle reads the SAME written dataset via DuckDB's
    // hive_partitioning, so a partition-placement bug (row in the wrong
    // lang dir), a dropped partition, or a value-mangled partition key
    // fails the hash — not just the plan shape, which
    // `PartitionPruneSpec` asserts separately.
    Q("q97_partitioned_prune",
      (spark, dir) => {
        val path = s"$FixtureDir/docs_by_lang"
        table(spark, dir, "documents")
          .write.mode("overwrite").partitionBy("lang").parquet(path)
        spark.read.parquet(path)
          .filter(col("lang").isin("de", "fr"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("doc_id")).as("n_ids"))
          .orderBy(col("lang"), col("source"))
      },
      Some(
        s"""SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
           |FROM read_parquet('$FixtureDir/docs_by_lang/*/*.parquet',
           |                  hive_partitioning=1)
           |WHERE lang IN ('de', 'fr')
           |GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // ---------------------------------------------------------------- q98
    // Bucketed co-located join: the amortized-shuffle layout for the
    // reference's dominant repeated join (new-vs-existing variants on
    // the natural key, `VariantLoad3.saveVariants:483-532`; scaladoc on
    // `sources/Bucketed`). Both sides are written hash-bucketed and
    // sorted on the join key; the sort-merge join over `spark.table`
    // then plans with NO Exchange on either side (`BucketedJoinSpec`
    // asserts the zero-exchange plan) — at 100 TB the per-load-wave
    // shuffle of the persistent side disappears. The oracle computes
    // the same join from the RAW parquet tables, so a row lost,
    // duplicated, or mis-bucketed by the bucketed write fails the hash.
    Q("q98_bucketed_join",
      (spark, dir) => {
        val ordPath = s"$FixtureDir/bkt_orders"
        val liPath = s"$FixtureDir/bkt_lineitem"
        // start from a clean slate AND drop any session-cached listing
        // for these paths: overwriting an external-table path whose
        // files a previous run wrote can otherwise leave a stale
        // file-status entry behind (observed once as FILE_NOT_EXIST on
        // the just-written table in a 97-query session)
        spark.sql("DROP TABLE IF EXISTS graft_q98_orders")
        spark.sql("DROP TABLE IF EXISTS graft_q98_lineitem")
        Fixtures.rmrf(new java.io.File(ordPath))
        Fixtures.rmrf(new java.io.File(liPath))
        graft.sources.Bucketed.writeBucketed(
          table(spark, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
          "graft_q98_orders", 8, Seq("o_orderkey"), path = Some(ordPath))
        graft.sources.Bucketed.writeBucketed(
          table(spark, dir, "lineitem")
            .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
          "graft_q98_lineitem", 8, Seq("l_orderkey"), path = Some(liPath))
        spark.catalog.refreshByPath(ordPath)
        spark.catalog.refreshByPath(liPath)
        spark.table("graft_q98_lineitem")
          .join(spark.table("graft_q98_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            countDistinct(col("o_orderkey")).as("n_orders"),
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS n_items,
          |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_price
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)))
}
