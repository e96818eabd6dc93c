package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{DnaFunctions, VariantFunctions}
import graft.operators.WigParser

/** The reference's pipeline-shaped operators, re-expressed Spark-first:
  * CDS assembly + codon translation (SURVEY §3.3 / A10 / W4 / X18-X21),
  * the stateful wig fixedStep reader (S4/W3), dedup-upsert with
  * deterministic id allocation (J5/K4/§7.4.3), positional pairing of
  * duplicate join keys (J11/W5), VCF FORMAT-index parsing (X9/F4/A5),
  * and SnpEff ANN parsing (S13/X11).
  *
  * Inputs are derived deterministically from the driver parquet tables
  * with dual-dialect fragments (same arithmetic in Spark and the DuckDB
  * oracle), mirroring the reference's input shapes.
  */
object QueriesPipeline {

  // ================= q60: CDS assembly + translation ==================
  //
  // Mirrors VariantPostProcessing.processTranscript (reference
  // `VariantPostProcessing.java:370-551`): per transcript, exons are
  // collected in genomic order, concatenated into a CDS, the variant is
  // applied at its CDS-relative position (prefix sum of prior exon
  // lengths — W4), minus-strand transcripts are reverse-complemented
  // with the relative position flipped, the CDS is truncated to a
  // multiple of 3 (variant beyond the truncation => triplet error), and
  // both sequences are codon-translated to call synonymous status.
  //
  // Synthetic transcript model (from `part`): 2-4 exons per transcript,
  // deterministic per-base DNA, one SNV per transcript landing in exon
  // (tid % n_exons).

  private def cdsQuery(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val t = table(spark, dir, "part").select(
      col("p_partkey").as("tid"),
      (col("p_partkey") % 3 + 2).cast("int").as("n_exons"),
      when(col("p_partkey") % 2 === 1, "-").otherwise("+").as("strand"))
    val ex = t
      .withColumn("exon_idx", explode(sequence(lit(0), col("n_exons") - 1)))
      .withColumn("e_len", (lit(24) + (col("tid") * 7 + col("exon_idx") * 13) % 33).cast("int"))
      .withColumn("dna", array_join(
        transform(sequence(lit(1), col("e_len")),
          i => element_at(split(lit("ACGT"), ""),
            ((col("tid") * 31 + col("exon_idx") * 7 + i * 3) % 4).cast("int") + 1)),
        ""))
    // W4: prefix sum of prior exon lengths = the variant's CDS offset base
    val w = Window.partitionBy(col("tid")).orderBy(col("exon_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hit = ex
      .withColumn("prior_len", coalesce(sum(col("e_len")).over(w), lit(0)).cast("long"))
      .filter(col("exon_idx") === col("tid") % col("n_exons"))
      .withColumn("offset", (col("tid") * 13) % col("e_len"))
      .withColumn("rel_pos", col("prior_len") + col("offset") + 1)
      .withColumn("var_base", element_at(split(lit("ACGT"), ""),
        ((col("tid") * 17 + 3) % 4).cast("int") + 1))
      .select(col("tid"), col("rel_pos"), col("var_base"))
    // A10: ordered CDS assembly (collect + sort by exon_idx, concat)
    val cds = ex.groupBy(col("tid"))
      .agg(sort_array(collect_list(struct(col("exon_idx"), col("dna")))).as("exons"))
      .select(col("tid"),
        array_join(transform(col("exons"), x => x("dna")), "").as("cds"))
    val asm = t.join(cds, "tid").join(hit, "tid")
      // X20: apply the SNV at rel_pos
      .withColumn("var_cds", concat(
        expr("substring(cds, 1, CAST(rel_pos - 1 AS INT))"),
        col("var_base"),
        expr("substring(cds, CAST(rel_pos + 1 AS INT))")))
      // X2 + relPos flip for minus strand
      .withColumn("cds2", when(col("strand") === "-",
        DnaFunctions.reverseComplement(col("cds"))).otherwise(col("cds")))
      .withColumn("var_cds2", when(col("strand") === "-",
        DnaFunctions.reverseComplement(col("var_cds"))).otherwise(col("var_cds")))
      .withColumn("rel2", when(col("strand") === "-",
        length(col("cds")) - col("rel_pos") + 1).otherwise(col("rel_pos")))
      // X19: truncate to a codon multiple; variant past it = triplet error
      .withColumn("trunc_len", expr("3 * (length(cds2) DIV 3)"))
      .withColumn("triplet_error", when(col("rel2") > col("trunc_len"), "T").otherwise("F"))
      // X21: aa position + codons
      .withColumn("aa_pos",
        when(col("triplet_error") === "T", 0L)
          .otherwise(expr("CAST((rel2 + 2) DIV 3 AS BIGINT)")))
      .withColumn("ref_aa",
        when(col("triplet_error") === "T", "skipped")
          .otherwise(DnaFunctions.translateCodon(
            expr("substring(cds2, CAST(3 * aa_pos - 2 AS INT), 3)"))))
      .withColumn("var_aa",
        when(col("triplet_error") === "T", "skipped")
          .otherwise(DnaFunctions.translateCodon(
            expr("substring(var_cds2, CAST(3 * aa_pos - 2 AS INT), 3)"))))
      // X17
      .withColumn("syn_status",
        when(col("triplet_error") === "T", "skipped")
          .otherwise(VariantFunctions.synStatus(col("ref_aa"), col("var_aa"))))
    asm.groupBy(col("strand"), col("triplet_error"), col("syn_status"))
      .agg(count(lit(1)).as("cnt"), sum(col("aa_pos")).as("sum_aa_pos"),
        sum(col("rel2")).as("sum_rel_pos"))
      .orderBy(col("strand"), col("triplet_error"), col("syn_status"))
  }

  private val cdsOracle: String = {
    val revcomp = (c: String) => s"reverse(translate(upper($c), 'ACGT', 'TGCA'))"
    s"""WITH t AS (
       |  SELECT p_partkey AS tid, CAST(p_partkey % 3 + 2 AS INT) AS n_exons,
       |    CASE WHEN p_partkey % 2 = 1 THEN '-' ELSE '+' END AS strand
       |  FROM part),
       |ex AS (
       |  SELECT tid, n_exons, strand, exon_idx,
       |    CAST(24 + (tid * 7 + exon_idx * 13) % 33 AS INT) AS e_len
       |  FROM t, LATERAL (SELECT unnest(generate_series(0, n_exons - 1)) AS exon_idx)),
       |exd AS (
       |  SELECT *, list_aggregate(
       |    [substr('ACGT', CAST((tid * 31 + exon_idx * 7 + i * 3) % 4 AS INT) + 1, 1)
       |     FOR i IN generate_series(1, e_len)], 'string_agg', '') AS dna
       |  FROM ex),
       |hit AS (
       |  SELECT tid,
       |    CAST(coalesce(sum(e_len) OVER (PARTITION BY tid ORDER BY exon_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      + ((tid * 13) % e_len) + 1 AS rel_pos,
       |    substr('ACGT', CAST((tid * 17 + 3) % 4 AS INT) + 1, 1) AS var_base
       |  FROM exd QUALIFY exon_idx = tid % n_exons),
       |cds AS (SELECT tid, string_agg(dna, '' ORDER BY exon_idx) AS cds FROM exd GROUP BY tid),
       |asm AS (
       |  SELECT t.tid, t.strand, c.cds, h.rel_pos,
       |    substr(c.cds, 1, CAST(h.rel_pos - 1 AS INT)) || h.var_base
       |      || substr(c.cds, CAST(h.rel_pos + 1 AS INT)) AS var_cds
       |  FROM t JOIN cds c ON c.tid = t.tid JOIN hit h ON h.tid = t.tid),
       |ori AS (
       |  SELECT tid, strand,
       |    CASE WHEN strand = '-' THEN ${revcomp("cds")} ELSE cds END AS cds2,
       |    CASE WHEN strand = '-' THEN ${revcomp("var_cds")} ELSE var_cds END AS var_cds2,
       |    CASE WHEN strand = '-' THEN length(cds) - rel_pos + 1 ELSE rel_pos END AS rel2
       |  FROM asm),
       |fin AS (
       |  SELECT *, CASE WHEN rel2 > 3 * (length(cds2) // 3) THEN 'T' ELSE 'F' END AS triplet_error,
       |    CASE WHEN rel2 > 3 * (length(cds2) // 3) THEN 0 ELSE (rel2 + 2) // 3 END AS aa_pos
       |  FROM ori),
       |aa AS (
       |  SELECT strand, triplet_error, CAST(aa_pos AS BIGINT) AS aa_pos, rel2,
       |    CASE WHEN triplet_error = 'T' THEN 'skipped'
       |         ELSE ${QueriesGenomic.codonCaseSql("substr(cds2, CAST(3 * aa_pos - 2 AS INT), 3)")} END AS ref_aa,
       |    CASE WHEN triplet_error = 'T' THEN 'skipped'
       |         ELSE ${QueriesGenomic.codonCaseSql("substr(var_cds2, CAST(3 * aa_pos - 2 AS INT), 3)")} END AS var_aa
       |  FROM fin)
       |SELECT strand, triplet_error,
       |  CASE WHEN triplet_error = 'T' THEN 'skipped'
       |       WHEN ref_aa = 'X' OR var_aa = 'X' THEN 'unassignable'
       |       WHEN ref_aa = var_aa THEN 'synonymous'
       |       ELSE 'nonsynonymous' END AS syn_status,
       |  count(*) AS cnt, CAST(sum(aa_pos) AS BIGINT) AS sum_aa_pos,
       |  CAST(sum(rel2) AS BIGINT) AS sum_rel_pos
       |FROM aa
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  // ================= q62: wig fixedStep parse =========================

  /** Deterministic wig-format lines derived from `orders`: one
    * 5-value block per (o_orderkey % 200 == 0) order. line_id is dense
    * within a block (b*10 + i). */
  private def wigLines(spark: org.apache.spark.sql.SparkSession, dir: String) =
    table(spark, dir, "orders")
      .filter(col("o_orderkey") % 200 === 0)
      .withColumn("i", explode(sequence(lit(0), lit(5))))
      .select(
        (col("o_orderkey") * 10 + col("i")).as("line_id"),
        when(col("i") === 0, concat(
          lit("fixedStep chrom=chr"), (col("o_orderkey") % 5 + 1).cast("string"),
          lit(" start="), ((col("o_orderkey") * 37) % 100000 + 1).cast("string"),
          lit(" step="), (col("o_orderkey") % 4 + 1).cast("string")))
          .otherwise(((col("o_orderkey") * 7 + col("i") * 13) % 1000).cast("string"))
          .as("line"))

  private val wigOracle: String =
    """WITH lines AS (
      |  SELECT o_orderkey * 10 + i AS line_id,
      |    CASE WHEN i = 0 THEN
      |      'fixedStep chrom=chr' || CAST(o_orderkey % 5 + 1 AS STRING)
      |        || ' start=' || CAST((o_orderkey * 37) % 100000 + 1 AS STRING)
      |        || ' step=' || CAST(o_orderkey % 4 + 1 AS STRING)
      |    ELSE CAST((o_orderkey * 7 + i * 13) % 1000 AS STRING) END AS line
      |  FROM orders, LATERAL (SELECT unnest(generate_series(0, 5)) AS i)
      |  WHERE o_orderkey % 200 = 0),
      |parsed AS (
      |  SELECT line_id, line,
      |    last_value(CASE WHEN line LIKE 'fixedStep%' THEN line END IGNORE NULLS)
      |      OVER (ORDER BY line_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS decl,
      |    last_value(CASE WHEN line LIKE 'fixedStep%' THEN line_id END IGNORE NULLS)
      |      OVER (ORDER BY line_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS decl_id
      |  FROM lines)
      |SELECT chrom, count(*) AS cnt, CAST(sum(pos) AS BIGINT) AS sum_pos,
      |  CAST(sum(score) AS BIGINT) AS sum_score
      |FROM (
      |  SELECT regexp_extract(decl, 'chrom=(\S+)', 1) AS chrom,
      |    CAST(regexp_extract(decl, 'start=([0-9]+)', 1) AS BIGINT)
      |      + (line_id - decl_id - 1) * CAST(regexp_extract(decl, 'step=([0-9]+)', 1) AS BIGINT) AS pos,
      |    CAST(line AS BIGINT) AS score
      |  FROM parsed WHERE line NOT LIKE 'fixedStep%')
      |GROUP BY chrom ORDER BY chrom""".stripMargin

  // ================= q63: dedup-upsert with deterministic ids =========

  private val upsertOracle: String = {
    val v = Synthetic.variantsSql
    s"""WITH variants AS ($v),
       |inc AS (
       |  SELECT chromosome, start_pos, upper(ref_nuc) AS ref, upper(var_nuc) AS var,
       |    count(*) AS n_rows
       |  FROM variants GROUP BY 1, 2, 3, 4),
       |existing AS (
       |  SELECT chromosome, start_pos, upper(ref_nuc) AS ref, upper(var_nuc) AS var,
       |    min(vid) AS ex_id
       |  FROM variants WHERE vid % 3 = 0 GROUP BY 1, 2, 3, 4),
       |mx AS (SELECT max(ex_id) AS max_ex FROM existing),
       |joined AS (
       |  SELECT i.*, e.ex_id FROM inc i
       |  LEFT JOIN existing e USING (chromosome, start_pos, ref, var)),
       |assigned AS (
       |  SELECT chromosome, n_rows, ex_id IS NULL AS is_new,
       |    CASE WHEN ex_id IS NOT NULL THEN ex_id
       |         ELSE (SELECT max_ex FROM mx)
       |           + row_number() OVER (PARTITION BY (ex_id IS NULL)
       |               ORDER BY chromosome, start_pos, ref, var) END AS assigned_id
       |  FROM joined)
       |SELECT chromosome, CAST(sum(n_rows) AS BIGINT) AS rows_in,
       |  count(*) AS distinct_keys,
       |  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS new_keys,
       |  CAST(sum(assigned_id) AS BIGINT) AS sum_assigned_id
       |FROM assigned
       |GROUP BY chromosome ORDER BY chromosome""".stripMargin
  }

  // ================= q86: fixup drift assertions ======================

  private val fixupOracle: String =
    s"""WITH v AS (SELECT vid, ref_nuc, var_nuc FROM (${Synthetic.variantsSql})),
       |base AS (
       |  SELECT *, CASE WHEN abs(length(ref_nuc) - length(var_nuc)) % 3 <> 0
       |    THEN 'T' ELSE 'F' END AS fsc FROM v),
       |stored AS (
       |  SELECT vid, ref_nuc, var_nuc, fsc,
       |    CASE WHEN vid % 7 = 0 THEN 'snp'
       |         WHEN length(ref_nuc) > 0 AND length(var_nuc) > 0 THEN 'snv'
       |         WHEN length(ref_nuc) = 0 THEN 'ins'
       |         ELSE 'del' END AS variant_type,
       |    CASE WHEN vid % 11 = 0 THEN (CASE WHEN fsc = 'T' THEN 'F' ELSE 'T' END)
       |         ELSE fsc END AS frameshift
       |  FROM base),
       |vt AS (
       |  SELECT *, CASE WHEN ref_nuc LIKE '%-%' OR var_nuc LIKE '%-%' THEN 'del'
       |       WHEN length(ref_nuc) < length(var_nuc) THEN 'ins'
       |       WHEN length(ref_nuc) > length(var_nuc) THEN 'del'
       |       WHEN length(ref_nuc) = 1 AND length(var_nuc) = 1 THEN 'snv'
       |       ELSE NULL END AS recomputed
       |  FROM stored)
       |SELECT 'variant_type' AS check_name,
       |  (variant_type IS DISTINCT FROM recomputed) AS drifted,
       |  coalesce(variant_type, '?') AS stored,
       |  coalesce(recomputed, '?') AS recomputed,
       |  count(*) AS n, CAST(sum(vid) AS BIGINT) AS sum_vid
       |FROM vt GROUP BY 1, 2, 3, 4
       |UNION ALL
       |SELECT 'frameshift', (frameshift IS DISTINCT FROM fsc),
       |  coalesce(frameshift, '?'), coalesce(fsc, '?'),
       |  count(*), CAST(sum(vid) AS BIGINT)
       |FROM stored GROUP BY 1, 2, 3, 4
       |UNION ALL
       |SELECT 'variant_type:after_fix', false, '*', '*', 0, 0
       |UNION ALL
       |SELECT 'frameshift:after_fix', false, '*', '*', 0, 0
       |ORDER BY 1, 2, 3, 4""".stripMargin

  // ============ q106: genic/num-allele/zygosity-percent fixups ========

  private val fixup2Oracle: String =
    s"""WITH variants AS (${Synthetic.variantsSql}),
       |genes AS (${Synthetic.genesSql}),
       |b0 AS (
       |  SELECT vid, min(sample_id) AS sample_id, min(chromosome) AS chromosome,
       |    min(start_pos) AS start_pos, min(ref_nuc) AS ref_nuc,
       |    min(var_nuc) AS var_nuc
       |  FROM variants GROUP BY vid),
       |b AS (
       |  SELECT *, CAST(vid % 101 AS INT) AS var_freq,
       |    CASE WHEN vid % 4 = 0 THEN 'Y' ELSE 'N' END AS zra,
       |    CASE WHEN ref_nuc LIKE '%-%' OR var_nuc LIKE '%-%' THEN 'del'
       |         WHEN length(ref_nuc) < length(var_nuc) THEN 'ins'
       |         WHEN length(ref_nuc) > length(var_nuc) THEN 'del'
       |         WHEN length(ref_nuc) = 1 AND length(var_nuc) = 1 THEN 'snv'
       |         ELSE NULL END AS variant_type,
       |    CAST(CASE WHEN vid % 19 = 0 THEN (vid % 101 + 7) % 101
       |              ELSE vid % 101 END AS INT) AS zpr
       |  FROM b0),
       |bz AS (
       |  SELECT *, CASE WHEN zpr = 100 THEN 'homozygous'
       |                 WHEN zpr >= 85 THEN 'possibly homozygous'
       |                 ELSE 'heterozygous' END AS zstat FROM b),
       |gt AS (
       |  SELECT bz.vid,
       |    CASE WHEN max(CASE WHEN g.gene_id IS NOT NULL THEN 1 ELSE 0 END) = 1
       |      THEN 'genic' ELSE 'intergenic' END AS truth
       |  FROM bz LEFT JOIN genes g
       |    ON g.g_chr = bz.chromosome
       |      AND bz.start_pos BETWEEN g.g_start AND g.g_stop
       |  GROUP BY bz.vid),
       |st AS (
       |  SELECT bz.*, CASE WHEN bz.vid % 13 = 0
       |      THEN (CASE WHEN truth = 'genic' THEN 'intergenic' ELSE 'genic' END)
       |      ELSE truth END AS genic_status, truth
       |  FROM bz JOIN gt ON gt.vid = bz.vid),
       |na AS (
       |  SELECT vid, CAST(count(*) OVER w
       |      + max(CASE WHEN zra = 'Y' THEN 1 ELSE 0 END) OVER w AS INT) AS na_comp
       |  FROM st WHERE zpr > 0
       |  WINDOW w AS (PARTITION BY sample_id, chromosome, start_pos)),
       |st2 AS (
       |  SELECT st.*,
       |    coalesce(na.na_comp + CASE WHEN st.vid % 17 = 0 THEN 1 ELSE 0 END, 1) AS zna,
       |    na.na_comp
       |  FROM st LEFT JOIN na ON na.vid = st.vid)
       |SELECT 'genic_status' AS check_name,
       |  (genic_status IS DISTINCT FROM truth) AS drifted,
       |  genic_status AS stored, truth AS recomputed,
       |  count(*) AS n, CAST(sum(vid) AS BIGINT) AS sum_vid
       |FROM st2 GROUP BY 1, 2, 3, 4
       |UNION ALL
       |SELECT 'num_allele', (zna IS DISTINCT FROM na_comp),
       |  CAST(zna AS VARCHAR), CAST(na_comp AS VARCHAR),
       |  count(*), CAST(sum(vid) AS BIGINT)
       |FROM st2 WHERE zpr > 0 GROUP BY 1, 2, 3, 4
       |UNION ALL
       |SELECT 'zygosity_perc_read', true, zstat,
       |  CASE WHEN var_freq = 100 THEN 'homozygous'
       |       WHEN var_freq >= 85 THEN 'possibly homozygous'
       |       ELSE 'heterozygous' END,
       |  count(*), CAST(sum(vid) AS BIGINT)
       |FROM st2 WHERE variant_type = 'snv' AND zpr <> var_freq
       |GROUP BY 1, 2, 3, 4
       |UNION ALL SELECT 'genic_status:after_fix', false, '*', '*', 0, 0
       |UNION ALL SELECT 'num_allele:after_fix', false, '*', '*', 0, 0
       |UNION ALL SELECT 'zygosity_perc_read:after_fix', false, '*', '*', 0, 0
       |ORDER BY 1, 2, 3, 4""".stripMargin

  // ================= q64: positional pairing join =====================

  private val pairingOracle: String =
    """WITH a AS (
      |  SELECT l_partkey % 300 AS k, CAST(l_quantity AS BIGINT) AS val_a,
      |    row_number() OVER (PARTITION BY l_partkey % 300
      |      ORDER BY l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT)) AS rn
      |  FROM lineitem),
      |b AS (
      |  SELECT l_suppkey % 300 AS k, CAST(l_linenumber AS BIGINT) AS val_b,
      |    row_number() OVER (PARTITION BY l_suppkey % 300
      |      ORDER BY l_orderkey, l_linenumber, CAST(l_linenumber AS BIGINT)) AS rn
      |  FROM lineitem)
      |SELECT a.k % 10 AS bucket, count(*) AS cnt,
      |  CAST(sum(a.val_a + b.val_b) AS BIGINT) AS sum_vals
      |FROM a JOIN b ON a.k = b.k AND a.rn = b.rn
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ================= q65: VCF FORMAT parsing ==========================

  private val formatOracle: String =
    """WITH g AS (
      |  SELECT
      |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'GT:AD:DP'
      |      WHEN 1 THEN 'GT:DP:AD' ELSE 'DP:GT:CLCAD2' END AS format,
      |    CASE CAST((l_orderkey + l_linenumber) % 4 AS INT)
      |      WHEN 0 THEN '0/0' WHEN 1 THEN '0/1' WHEN 2 THEN '1/1' ELSE './.' END AS gt,
      |    CAST(l_partkey % 30 AS STRING) || ',' || CAST(l_suppkey % 30 AS STRING) AS ad,
      |    CAST(l_partkey % 30 + l_suppkey % 30 + l_orderkey % 7 AS STRING) AS dp
      |  FROM lineitem),
      |s AS (
      |  SELECT format,
      |    CASE CAST(substr(format, 1, 2) AS STRING)
      |      WHEN 'GT' THEN (CASE WHEN format = 'GT:AD:DP' THEN gt || ':' || ad || ':' || dp
      |                           ELSE gt || ':' || dp || ':' || ad END)
      |      ELSE dp || ':' || gt || ':' || ad END AS sample
      |  FROM g),
      |p AS (
      |  SELECT string_split(format, ':') AS ff, string_split(sample, ':') AS ss FROM s),
      |x AS (
      |  SELECT ss[list_position(ff, 'GT')] AS gt,
      |    ss[CASE WHEN list_position(ff, 'AD') = 0 THEN list_position(ff, 'CLCAD2')
      |            ELSE list_position(ff, 'AD') END] AS ad,
      |    CAST(ss[list_position(ff, 'DP')] AS BIGINT) AS dp
      |  FROM p)
      |SELECT gt, count(*) AS cnt, CAST(sum(dp) AS BIGINT) AS sum_dp,
      |  CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(ad, ','), v -> CAST(v AS BIGINT))),
      |    (acc, x) -> acc + x)) AS BIGINT) AS sum_ad
      |FROM x
      |WHERE gt NOT IN ('./.', '0/0')
      |GROUP BY gt ORDER BY gt""".stripMargin

  // ================= q66: SnpEff ANN parsing ==========================

  private val annOracle: String =
    """WITH src AS (
      |  SELECT l_orderkey AS k, CAST(l_linenumber % 3 + 1 AS INT) AS n,
      |    l_linenumber AS ln
      |  FROM lineitem),
      |gen AS (
      |  SELECT k, 'DP=' || CAST(k % 100 AS STRING) || ';ANN='
      |    || list_aggregate(
      |         [substr('ACGT', CAST((k + e) % 4 AS INT) + 1, 1) || '|'
      |           || (CASE CAST((k + e) % 4 AS INT) WHEN 0 THEN 'missense_variant'
      |               WHEN 1 THEN 'synonymous_variant' WHEN 2 THEN 'stop_gained' ELSE '' END)
      |           || '|'
      |           || (CASE CAST((k * 3 + e) % 3 AS INT) WHEN 0 THEN 'HIGH'
      |               WHEN 1 THEN 'MODERATE' ELSE 'LOW' END)
      |           || '|gene' || CAST((k + e) % 50 AS STRING)
      |          FOR e IN generate_series(1, n)], 'string_agg', ',')
      |    || ';MQ=' || CAST(k % 60 AS STRING) AS info
      |  FROM src),
      |ann AS (
      |  SELECT unnest(string_split(regexp_extract(info, 'ANN=([^;]+)', 1), ',')) AS entry
      |  FROM gen),
      |f AS (
      |  SELECT string_split(entry, '|') AS fs FROM ann)
      |SELECT coalesce(nullif(fs[2], ''), 'none') AS effect, fs[3] AS impact,
      |  count(*) AS cnt
      |FROM f
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(

    Q("q60_cds_translate", (spark, dir) => cdsQuery(spark, dir), Some(cdsOracle)),

    Q("q62_wig_parse",
      (spark, dir) =>
        WigParser.parse(wigLines(spark, dir), binSize = 1024L)
          .groupBy(col("chrom"))
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("sum_pos"),
            sum(col("score")).as("sum_score"))
          .orderBy(col("chrom")),
      Some(wigOracle)),

    // J5/K4: natural-key dedup-upsert. Existing rows keep their id; new
    // keys get max(existing) + dense rank under the natural-key total
    // order — the deterministic replacement for the reference's Oracle
    // sequence (`VariantLoad3.saveVariants:479-589`). The rank comes
    // from IdAssign.assignDense (range-partition + parallel in-partition
    // numbering + tiny offset join) so no row ever funnels through a
    // single global-window partition.
    Q("q63_dedup_upsert",
      (spark, dir) => {
        val v = Synthetic.variants(spark, dir)
          .select(col("vid"), col("chromosome"), col("start_pos"),
            upper(col("ref_nuc")).as("ref"), upper(col("var_nuc")).as("var"))
        val keys = Seq("chromosome", "start_pos", "ref", "var")
        // single aggregation pass: the incoming per-key count and the
        // existing-id lookup (a left-outer join in the naive form) fold
        // into one groupBy — min(when(existing, vid)) is null exactly
        // where the join would miss. One shuffle over the variants
        // instead of two groupBys + an equi-join.
        val grouped = v.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n_rows"),
            min(when(col("vid") % 3 === 0, col("vid"))).as("ex_id"))
          // materialized once: max_ex and the new/old branch split below
          // would otherwise recompute the aggregation per consumer
          .localCheckpoint(true)
        val mx = grouped.agg(max(col("ex_id")).as("max_ex"))
        val joined = grouped.crossJoin(broadcast(mx))
        val newKeys = graft.operators.IdAssign
          .assignDense(joined.filter(col("ex_id").isNull), keys, "__seq")
          .withColumn("assigned_id", col("max_ex") + col("__seq"))
          .drop("__seq")
          .withColumn("is_new", lit(true))
        val oldKeys = joined.filter(col("ex_id").isNotNull)
          .withColumn("assigned_id", col("ex_id"))
          .withColumn("is_new", lit(false))
        newKeys.unionByName(oldKeys)
          .groupBy(col("chromosome"))
          .agg(sum(col("n_rows")).as("rows_in"),
            count(lit(1)).as("distinct_keys"),
            sum(when(col("is_new"), 1L).otherwise(0L)).as("new_keys"),
            sum(col("assigned_id")).as("sum_assigned_id"))
          .orderBy(col("chromosome"))
      },
      Some(upsertOracle)),

    // J11/W5: equal keys on both sides pair off positionally (the
    // reference consumes first-match with iterator.remove; row_number on
    // both sides + equi-join is the deterministic distributed form).
    // §5.5 fixups as drift-assertion jobs: a legacy-loaded VARIANT
    // table (deliberately drifted labels baked in: every 7th vid a
    // 'snp'-era type, every 11th a flipped frameshift flag) is WRITTEN
    // to parquet, read back, re-derived column by column
    // (`fixup/VariantTypeFixUp.java:47-63`,
    // `fixup/FrameShiftFixUp.java:55-64`), drift reported per
    // (stored, recomputed) pair, then the fix is applied, re-written,
    // and re-checked — the after_fix rows assert 0 remaining drift
    // against the oracle's literal zeros. Map-only at any scale: the
    // re-derivation is a projection; only the report aggregates.
    Q("q86_fixup_drift",
      (spark, dir) => {
        import graft.operators.Fixup
        val fsc = VariantFunctions.frameshiftFlag(col("ref_nuc"), col("var_nuc"))
        val stored0 = Synthetic.variants(spark, dir)
          .select(col("vid"), col("ref_nuc"), col("var_nuc"))
          .withColumn("variant_type",
            when(col("vid") % 7 === 0, "snp")
              .otherwise(VariantFunctions.variantType(col("ref_nuc"), col("var_nuc"))))
          .withColumn("frameshift",
            when(col("vid") % 11 === 0,
              when(fsc === "T", "F").otherwise("T")).otherwise(fsc))
        val path = s"${QueriesSources.FixtureDir}/fixup_variants"
        stored0.write.mode("overwrite").parquet(path)
        val stored = spark.read.parquet(path)
        def report(name: String, d: org.apache.spark.sql.DataFrame,
                   storedCol: String) =
          d.groupBy(lit(name).as("check_name"), col("drifted"),
              coalesce(col(storedCol), lit("?")).as("stored"),
              coalesce(col("recomputed"), lit("?")).as("recomputed"))
            .agg(count(lit(1)).as("n"), sum(col("vid")).as("sum_vid"))
        def afterFix(name: String, d: org.apache.spark.sql.DataFrame) =
          d.filter(col("drifted")).agg(count(lit(1)).as("n"))
            .select(lit(name).as("check_name"), lit(false).as("drifted"),
              lit("*").as("stored"), lit("*").as("recomputed"),
              col("n"), lit(0L).as("sum_vid"))
        val vt = Fixup.variantTypeDrift(stored)
        val fs = Fixup.frameshiftDrift(stored)
        // fix, write the corrected table, read back, re-assert
        val fixedPath = s"$path-fixed"
        Fixup.applyFix(
            Fixup.applyFix(stored, "variant_type",
              VariantFunctions.variantTypeFixup(col("ref_nuc"), col("var_nuc"))),
            "frameshift", fsc)
          .write.mode("overwrite").parquet(fixedPath)
        val fixed = spark.read.parquet(fixedPath)
        report("variant_type", vt, "variant_type")
          .unionByName(report("frameshift", fs, "frameshift"))
          .unionByName(afterFix("variant_type:after_fix",
            Fixup.variantTypeDrift(fixed)))
          .unionByName(afterFix("frameshift:after_fix",
            Fixup.frameshiftDrift(fixed)))
          .orderBy(col("check_name"), col("drifted"), col("stored"),
            col("recomputed"))
      },
      Some(fixupOracle)),

    // §5.5 complete: the three remaining fixups as drift jobs.
    //  - genic_status (GenicStatusFixUp.java:35-109): re-derivation is
    //    an interval join (binned broadcast, q25's shape), not a
    //    projection — the most valuable fixup.
    //  - num_allele (NumAllelesFixUp.java:25-110): per-(sample, chr,
    //    pos) site row count + ref-allele bump over the percent>0
    //    scope — one window aggregation, keyed exactly like the
    //    reference's ORDER BY cursor.
    //  - zygosity_percent_read (ZygosityPercReadFixUp.java:35-117):
    //    SNV rows whose stored percent disagrees with var_freq get
    //    percent := var_freq and the gender-free status ladder.
    // The fixture corrupts disjoint vid strata (%13 / %17 / %19), runs
    // each drift report, applies all three fixes (genic, then percent
    // — which re-shapes the percent>0 scope — then num_allele over the
    // POST-fix scope, since that is the state a re-run job would see),
    // persists the fixed table, and re-asserts zero drift per check.
    // 100 TB: one broadcast interval join + one window shuffle +
    // map-only projections; the after-fix recheck repeats the same.
    Q("q106_fixup_drift2",
      (spark, dir) => {
        import graft.operators.Fixup
        val g = Synthetic.genes(spark, dir)
        // unique-vid stored table (vid repeats in the synthetic corpus;
        // fixups address rows by id) — the corpus-wide groupBy(vid)
        // behind it is staged once per JVM and shared with q105
        val b = Fixtures.dedupVariants(spark, dir)
          .drop("total_depth")
          .withColumn("var_freq", (col("vid") % 101).cast("int"))
          .withColumn("zygosity_ref_allele",
            when(col("vid") % 4 === 0, "Y").otherwise("N"))
          // variantTypeFixup, not the loader's variantType: the oracle's
          // CTE encodes the fixup length-ladder, and the
          // zygosity_perc_read scope filters on this column — the two
          // expressions only coincide on corpora with no '-' alleles and
          // no equal-length multi-base pairs, so share the one the
          // oracle mirrors
          .withColumn("variant_type",
            VariantFunctions.variantTypeFixup(col("ref_nuc"), col("var_nuc")))
          // corruption C: vid%19 rows store a wrong percent (+7 mod 101
          // is never a fixpoint), with a status CONSISTENT with the
          // wrong percent — exactly the drift the reference job hunts
          .withColumn("zygosity_percent_read",
            when(col("vid") % 19 === 0,
              ((col("var_freq") + 7) % 101).cast("int"))
              .otherwise(col("var_freq")))
          .withColumn("zygosity_status",
            Fixup.zygosityLadder(col("zygosity_percent_read")))
        // corruption A: genic truth flipped on vid%13 rows
        val withGenic = Fixup.genicStatusDrift(
            b.withColumn("genic_status", lit("?")), g)
          .withColumn("genic_status",
            when(col("vid") % 13 === 0,
              when(col("recomputed") === "genic", "intergenic")
                .otherwise("genic"))
              .otherwise(col("recomputed")))
          .drop("recomputed", "drifted")
        // (r17: the r6-era localCheckpoint here is gone — it existed
        // because naTruth and the stored0 join both consumed this
        // subtree; the inline-window rewrite below leaves exactly ONE
        // consumer, and the genic re-derivation is map-side since r16,
        // so materializing it would only add an extra full pass)
        // corruption B: site-count truth (over the stored percent>0
        // scope) bumped by one on vid%17 rows; out-of-scope rows
        // store the untouched default 1. Inline window form (r17,
        // Fixup.numAlleleRecomputed): the old filter -> window ->
        // join-back-on-vid paid the site exchange plus two vid
        // exchanges in this write job; one unfiltered window is
        // row-identical under the unique-vid contract.
        val stored0 = withGenic
          .withColumn("zygosity_num_allele",
            coalesce(Fixup.numAlleleRecomputed +
              when(col("vid") % 17 === 0, 1).otherwise(0), lit(1)))
        val path = s"${QueriesSources.FixtureDir}/fixup2_variants"
        stored0.write.mode("overwrite").parquet(path)
        val stored = spark.read.parquet(path)
        def report(name: String, d: org.apache.spark.sql.DataFrame,
                   storedC: org.apache.spark.sql.Column,
                   recomputedC: org.apache.spark.sql.Column) =
          d.groupBy(lit(name).as("check_name"), col("drifted"),
              storedC.cast("string").as("stored"),
              recomputedC.cast("string").as("recomputed"))
            .agg(count(lit(1)).as("n"), sum(col("vid")).as("sum_vid"))
        // materialized once: `a` (an interval join over the stored
        // parquet) sits under the genic report AND — via fixedAC — the
        // fixed-table write; un-checkpointed it would execute twice
        // (r17: the naFixed join-back that made it THREE consumers is
        // now an inline window, Fixup.numAlleleRecomputed).
        val a = Fixup.genicStatusDrift(stored, g).localCheckpoint(true)
        val nA = Fixup.numAlleleDrift(stored)
        val c = Fixup.zygosityPercentScope(stored)
          .withColumn("recomputed", Fixup.zygosityLadder(col("var_freq")))
          .withColumn("drifted", lit(true))
        // apply all three fixes: genic, then percent/status, then
        // num_allele recomputed over the post-fix percent>0 scope
        val fixedAC = a.withColumn("genic_status", col("recomputed"))
          .drop("recomputed", "drifted")
          .withColumn("__snvFix",
            col("variant_type") === "snv" &&
              !(col("zygosity_percent_read") <=> col("var_freq")))
          .withColumn("zygosity_percent_read",
            when(col("__snvFix"), col("var_freq"))
              .otherwise(col("zygosity_percent_read")))
          .withColumn("zygosity_status",
            when(col("__snvFix"),
              Fixup.zygosityLadder(col("zygosity_percent_read")))
              .otherwise(col("zygosity_status")))
          .drop("__snvFix")
        // num_allele recomputed over the POST-fix percent>0 scope —
        // inline window (r17), replacing the second filter -> window ->
        // join-back-on-vid of this query (fixedAC no longer feeds both
        // sides of a self-join; the fixed-table write is one window
        // over the map-side projection of the `a` checkpoint)
        val fixedPath = s"$path-fixed"
        fixedAC
          .withColumn("zygosity_num_allele",
            coalesce(Fixup.numAlleleRecomputed, col("zygosity_num_allele")))
          .write.mode("overwrite").parquet(fixedPath)
        val fixed = spark.read.parquet(fixedPath)
        // after-fix recheck in ONE pass over the re-read fixed table
        // (r17, guide §2.4/§6): the three separate afterFix branches
        // each re-scanned `fixed` and paid their own aggregation
        // exchange (22 Exchanges in the r16 report plan). All three
        // rechecks are row-local once the genic re-derivation (map-side
        // broadcast join) and the num-allele site window are attached,
        // so one scan + one window + one aggregate computes all three
        // remaining-drift counts; stack() re-shapes them into the same
        // three report rows. Still computed from the persisted fixed
        // table — the recheck semantics (a re-run job would read the
        // store) are unchanged.
        val afterAll = Fixup.genicStatusDrift(fixed, g)
          .withColumn("__naRe", Fixup.numAlleleRecomputed)
          .agg(
            coalesce(sum(when(col("drifted"), 1L)), lit(0L)).as("n_genic"),
            coalesce(sum(when(col("zygosity_percent_read") > 0 &&
              !(col("zygosity_num_allele") <=> col("__naRe")), 1L)),
              lit(0L)).as("n_na"),
            coalesce(sum(when(col("variant_type") === "snv" &&
              !(col("zygosity_percent_read") <=> col("var_freq")), 1L)),
              lit(0L)).as("n_zyg"))
          .select(expr("""stack(3,
              'genic_status:after_fix', n_genic,
              'num_allele:after_fix', n_na,
              'zygosity_perc_read:after_fix', n_zyg)
            AS (check_name, n)"""))
          .select(col("check_name"), lit(false).as("drifted"),
            lit("*").as("stored"), lit("*").as("recomputed"),
            col("n"), lit(0L).as("sum_vid"))
        report("genic_status", a, col("genic_status"), col("recomputed"))
          .unionByName(report("num_allele", nA,
            col("zygosity_num_allele"), col("recomputed")))
          .unionByName(report("zygosity_perc_read", c,
            col("zygosity_status"), col("recomputed")))
          .unionByName(afterAll)
          .orderBy(col("check_name"), col("drifted"), col("stored"),
            col("recomputed"))
      },
      Some(fixup2Oracle)),

    Q("q64_pairing_join",
      (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — the value column joins the sort key so tied rows
        // pair identically in both engines
        val wa = Window.partitionBy(col("k"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("val_a"))
        val wb = Window.partitionBy(col("k"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("val_b"))
        val a = li.select((col("l_partkey") % 300).as("k"),
            col("l_quantity").cast("long").as("val_a"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("rn", row_number().over(wa))
          .select(col("k"), col("val_a"), col("rn"))
        val b = li.select((col("l_suppkey") % 300).as("k"),
            col("l_linenumber").cast("long").as("val_b"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("rn", row_number().over(wb))
          .select(col("k").as("bk"), col("val_b"), col("rn").as("brn"))
        a.join(b, col("k") === col("bk") && col("rn") === col("brn"))
          .groupBy((col("k") % 10).as("bucket"))
          .agg(count(lit(1)).as("cnt"), sum(col("val_a") + col("val_b")).as("sum_vals"))
          .orderBy(col("bucket"))
      },
      Some(pairingOracle)),

    // S5: FASTA reference-genome source through the oracle gate —
    // deterministic synthetic FASTA text (5 chromosomes from region,
    // 20 x 40bp lines each) is parsed (header spans -> per-line
    // offsets), re-chunked to a fixed-width chunk table, and a random
    // 333bp window is extracted per chromosome via chunk-pruned
    // substring concat. The oracle rebuilds the same sequences with
    // string aggregation and plain substr.
    Q("q72_fasta_extract",
      (spark, dir) => {
        val bases = typedlit(Seq("A", "C", "G", "T"))
        val chrs = table(spark, dir, "region").select((col("r_regionkey") + 1).as("c"))
        val headers = chrs.select((col("c") * 10000).as("line_id"),
          concat(lit(">chr"), col("c")).as("line"))
        val seqLines = chrs.withColumn("i", explode(sequence(lit(1), lit(20))))
          .select((col("c") * 10000 + col("i")).as("line_id"),
            array_join(transform(sequence(lit(1), lit(40)),
              j => element_at(bases,
                ((col("c") * 7 + col("i") * 3 + j) % 4 + 1).cast("int"))), "").as("line"))
        val chunks = graft.sources.Fasta.toChunks(
          graft.sources.Fasta.parseLines(headers.unionByName(seqLines)), width = 128)
          .localCheckpoint(true) // five extracts below share the parse
        (1 to 5).map(c =>
            graft.sources.Fasta.getSequence(chunks, s"chr$c", 123L, 456L, width = 128))
          .reduce(_ unionByName _)
          .orderBy(col("chr"))
      },
      Some(
        """WITH c AS (SELECT r_regionkey + 1 AS c FROM region),
          |ln AS (
          |  SELECT c, i, string_agg(ch, '' ORDER BY j) AS line
          |  FROM (SELECT c, i, j, ['A','C','G','T'][(c*7 + i*3 + j) % 4 + 1] AS ch
          |        FROM c, generate_series(1, 20) s(i), generate_series(1, 40) t(j))
          |  GROUP BY c, i),
          |chrseq AS (SELECT c, string_agg(line, '' ORDER BY i) AS seq FROM ln GROUP BY c)
          |SELECT 'chr' || CAST(c AS STRING) AS chr, substr(seq, 124, 333) AS seq
          |FROM chrseq ORDER BY chr""".stripMargin)),

    // X9/F4/A5: FORMAT-field index resolution (AD with CLCAD2 fallback),
    // genotype filter, AD-array depth sum.
    Q("q65_vcf_format_parse",
      (spark, dir) => {
        val g = table(spark, dir, "lineitem").select(
          expr("CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'GT:AD:DP' WHEN 1 THEN 'GT:DP:AD' ELSE 'DP:GT:CLCAD2' END").as("format"),
          expr("CASE CAST((l_orderkey + l_linenumber) % 4 AS INT) WHEN 0 THEN '0/0' WHEN 1 THEN '0/1' WHEN 2 THEN '1/1' ELSE './.' END").as("gt0"),
          expr("CAST(l_partkey % 30 AS STRING) || ',' || CAST(l_suppkey % 30 AS STRING)").as("ad0"),
          expr("CAST(l_partkey % 30 + l_suppkey % 30 + l_orderkey % 7 AS STRING)").as("dp0"))
        val s = g.withColumn("sample",
          when(col("format") === "GT:AD:DP", concat_ws(":", col("gt0"), col("ad0"), col("dp0")))
            .when(col("format") === "GT:DP:AD", concat_ws(":", col("gt0"), col("dp0"), col("ad0")))
            .otherwise(concat_ws(":", col("dp0"), col("gt0"), col("ad0"))))
        val p = s.select(split(col("format"), ":").as("ff"), split(col("sample"), ":").as("ss"))
        val adIdx = when(array_position(col("ff"), "AD") === 0,
          array_position(col("ff"), "CLCAD2")).otherwise(array_position(col("ff"), "AD"))
        p.select(
            element_at(col("ss"), array_position(col("ff"), "GT").cast("int")).as("gt"),
            element_at(col("ss"), adIdx.cast("int")).as("ad"),
            element_at(col("ss"), array_position(col("ff"), "DP").cast("int")).cast("long").as("dp"))
          .filter(!col("gt").isin("./.", "0/0"))
          .withColumn("ad_sum",
            aggregate(transform(split(col("ad"), ","), v => v.cast("long")),
              lit(0L), (acc, x) => acc + x))
          .groupBy(col("gt"))
          .agg(count(lit(1)).as("cnt"), sum(col("dp")).as("sum_dp"), sum(col("ad_sum")).as("sum_ad"))
          .orderBy(col("gt"))
      },
      Some(formatOracle)),

    // S13/X11: SnpEff ANN= INFO parsing — regexp extract, explode on
    // ',', split on '|', empty field -> null.
    Q("q66_snpeff_ann_parse",
      (spark, dir) => {
        val gen = table(spark, dir, "lineitem").select(
          col("l_orderkey").as("k"), (col("l_linenumber") % 3 + 1).cast("int").as("n"))
          .withColumn("info", concat(
            lit("DP="), (col("k") % 100).cast("string"), lit(";ANN="),
            array_join(transform(sequence(lit(1), col("n")), e => concat(
              element_at(split(lit("ACGT"), ""), ((col("k") + e) % 4).cast("int") + 1),
              lit("|"),
              when((col("k") + e) % 4 === 0, "missense_variant")
                .when((col("k") + e) % 4 === 1, "synonymous_variant")
                .when((col("k") + e) % 4 === 2, "stop_gained").otherwise(""),
              lit("|"),
              when((col("k") * 3 + e) % 3 === 0, "HIGH")
                .when((col("k") * 3 + e) % 3 === 1, "MODERATE").otherwise("LOW"),
              lit("|gene"), ((col("k") + e) % 50).cast("string"))), ","),
            lit(";MQ="), (col("k") % 60).cast("string")))
        gen.select(explode(split(regexp_extract(col("info"), "ANN=([^;]+)", 1), ",")).as("entry"))
          .select(split(col("entry"), "\\|").as("fs"))
          .select(
            coalesce(nullif(element_at(col("fs"), 2), lit("")), lit("none")).as("effect"),
            element_at(col("fs"), 3).as("impact"))
          .groupBy(col("effect"), col("impact"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("effect"), col("impact"))
      },
      Some(annOracle)),

    // X10/X12/X14: INFO key=value map extraction (str_to_map), the
    // `RGDID:<int>;<hgvs>` id parse, digit-stripped positions
    // ("1,234" -> 1234) and chr-from-filename. The oracle reproduces the
    // *values* with DuckDB regexps (DuckDB has no str_to_map).
    Q("q67_scalar_parsers",
      (spark, dir) => {
        val src = table(spark, dir, "lineitem").select(
          col("l_orderkey").as("k"), col("l_partkey").as("p"), col("l_suppkey").as("s"))
          .withColumn("info", concat(
            lit("END="), (col("k") % 9999).cast("string"),
            lit(";DP="), (col("p") % 100).cast("string"),
            lit(";AC="), (col("s") % 10).cast("string")))
          .withColumn("id_col", concat(
            lit("RGDID:"), (col("k") % 100000).cast("string"),
            lit(";c."), (col("p") % 5000).cast("string"), lit("A>G")))
          .withColumn("pos_str", concat(
            (col("p") % 900 + 100).cast("string"), lit(","),
            (col("s") % 900 + 100).cast("string")))
          .withColumn("fname", concat(lit("chr"), (col("k") % 20 + 1).cast("string"), lit(".txt")))
        src
          .withColumn("m", expr("str_to_map(info, ';', '=')"))
          .select(
            regexp_extract(col("fname"), "chr(.+)\\.txt", 1).as("chr"),
            element_at(col("m"), "DP").cast("long").as("dp"),
            element_at(col("m"), "AC").cast("long").as("ac"),
            regexp_extract(col("id_col"), "RGDID:([0-9]+);", 1).cast("long").as("rgd_id"),
            regexp_replace(col("pos_str"), "[^0-9]", "").cast("long").as("pos"))
          .groupBy(col("chr"))
          .agg(count(lit(1)).as("cnt"), sum(col("dp")).as("sum_dp"),
            sum(col("ac")).as("sum_ac"), sum(col("rgd_id")).as("sum_rgd"),
            sum(col("pos")).as("sum_pos"))
          .orderBy(col("chr"))
      },
      Some(
        """SELECT chr, count(*) AS cnt, CAST(sum(dp) AS BIGINT) AS sum_dp,
          |  CAST(sum(ac) AS BIGINT) AS sum_ac, CAST(sum(rgd_id) AS BIGINT) AS sum_rgd,
          |  CAST(sum(pos) AS BIGINT) AS sum_pos
          |FROM (
          |  SELECT CAST(l_orderkey % 20 + 1 AS STRING) AS chr,
          |    l_partkey % 100 AS dp,
          |    l_suppkey % 10 AS ac,
          |    l_orderkey % 100000 AS rgd_id,
          |    CAST(CAST(l_partkey % 900 + 100 AS STRING)
          |      || CAST(l_suppkey % 900 + 100 AS STRING) AS BIGINT) AS pos
          |  FROM lineitem)
          |GROUP BY chr ORDER BY chr""".stripMargin)),

    // J9/W1 as a join: rsId enrichment with first-row-wins semantics
    // made deterministic — the dim side is reduced to one row per key
    // with row_number before the left join (the reference's cursor-order
    // "first match" + 1-row memo cache, `CommonFormat2Writer
    // .getDbSnpRsId:123-161`, becomes order-explicit and distributed).
    Q("q68_rsid_enrich",
      (spark, dir) => {
        val v = Synthetic.variants(spark, dir)
          .select(col("vid"), col("chromosome"), col("start_pos"))
        val dim = table(spark, dir, "part").select(
          expr(s"CASE (p_partkey % 22) WHEN 20 THEN 'X' WHEN 21 THEN 'Y' ELSE CAST((p_partkey % 22) + 1 AS STRING) END").as("d_chr"),
          ((col("p_partkey") * 137) % 3000000 + 1).as("d_pos"),
          concat(lit("rs"), col("p_partkey").cast("string")).as("rs_id"))
        val w = Window.partitionBy(col("d_chr"), col("d_pos")).orderBy(col("rs_id"))
        val first = dim.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        v.join(broadcast(first),
            col("chromosome") === col("d_chr") && col("start_pos") === col("d_pos"),
            "left_outer")
          .groupBy(col("chromosome"))
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("rs_id").isNotNull, 1L).otherwise(0L)).as("enriched"))
          .orderBy(col("chromosome"))
      },
      Some {
        val v = Synthetic.variantsSql
        s"""WITH variants AS ($v),
           |dim AS (
           |  SELECT CASE (p_partkey % 22) WHEN 20 THEN 'X' WHEN 21 THEN 'Y'
           |           ELSE CAST((p_partkey % 22) + 1 AS STRING) END AS d_chr,
           |    (p_partkey * 137) % 3000000 + 1 AS d_pos,
           |    'rs' || CAST(p_partkey AS STRING) AS rs_id
           |  FROM part),
           |first_rs AS (
           |  SELECT d_chr, d_pos, rs_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY d_chr, d_pos ORDER BY rs_id) AS rn
           |    FROM dim) WHERE rn = 1)
           |SELECT chromosome, count(*) AS cnt,
           |  CAST(sum(CASE WHEN rs_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS enriched
           |FROM variants v
           |LEFT JOIN first_rs f ON v.chromosome = f.d_chr AND v.start_pos = f.d_pos
           |GROUP BY chromosome ORDER BY chromosome""".stripMargin
      }),

    // J12/J13: the ClinVar suite (`convert/ClinVar2Vcf.java:81-131`,
    // `VariantProcessingBase.insertClinvarIds:346-384`) as one gated
    // query. Four reference semantics compose:
    //  - multi-position reject: a variant keeps its assembly position
    //    only if exactly ONE non-Y maps_data row exists (`getVarPos`
    //    nulls varChr on the 2nd hit; 'Y' rows are excluded BEFORE
    //    counting) — a count-over-rgd_id window, one shuffle;
    //  - existence join against genomic_elements (the reference's
    //    comma join selects no ge columns) — left_semi, so duplicate
    //    element rows can't fan out the variant side. Deliberate
    //    deviation: the reference's inner join DOES emit a duplicate
    //    VCF line per duplicate ge row (the synthetic elements table
    //    adds a second row for every 5th rgd_id); that fan-out is a
    //    join artifact, not intent, and is not reproduced here;
    //  - nucleotide QC (`qcVarNucAndRefNuc:236-268`): ref/var each
    //    non-empty and either '-' or ^[ACGTN]+$;
    //  - clinvar_id backfill (J12): left join to CLINVAR-sourced
    //    elements (source matched case-insensitively), symbol becomes
    //    the id — the Spark form of the reference's batched UPDATE.
    // 100 TB: every join is a shuffled equi-join on rgd_id; the window
    // and all three joins share that key, so AQE coalesces into few
    // stages and nothing broadcasts a corpus-sized frame.
    Q("q81_clinvar_export",
      (spark, dir) => {
        def qcOk(c: org.apache.spark.sql.Column) =
          c.isNotNull && length(c) > 0 && (c === "-" || c.rlike("^[ACGTN]+$"))
        val cv = Synthetic.clinvar(spark, dir)
          .filter(col("object_type").isin("single nucleotide variant",
            "deletion", "insertion", "duplication"))
          .filter(qcOk(col("ref_nuc")) && qcOk(col("var_nuc")))
        val single = Synthetic.mapsData(spark, dir)
          .filter(col("chromosome") =!= "Y")
          .withColumn("n_pos", count(lit(1)).over(Window.partitionBy(col("rgd_id"))))
          .filter(col("n_pos") === 1)
          .select(col("rgd_id"), col("start_pos"), col("chromosome"))
        val ge = Synthetic.elements(spark, dir)
        val backfill = ge.filter(lower(col("source")) === "clinvar")
          .select(col("rgd_id"), col("symbol").as("clinvar_id"))
        cv.join(ge.select("rgd_id"), Seq("rgd_id"), "left_semi")
          .join(single, Seq("rgd_id"))
          .join(backfill, Seq("rgd_id"), "left_outer")
          .withColumn("vcf_id", concat(lit("RGDID:"),
            col("rgd_id").cast("string"), lit(";"), col("name")))
          .groupBy(col("chromosome"))
          .agg(count(lit(1)).as("n_written"),
            sum(col("start_pos")).as("sum_pos"),
            sum(when(col("rs_id").isNotNull, 1L).otherwise(0L)).as("n_with_rs"),
            sum(when(col("clinvar_id").isNotNull, 1L).otherwise(0L)).as("n_backfilled"),
            countDistinct(col("clinvar_id")).as("n_clinvar_ids"),
            min(col("vcf_id")).as("first_vcf_id"))
          .orderBy(col("chromosome"))
      },
      Some {
        s"""WITH clinvar AS (${Synthetic.clinvarSql}),
           |maps_data AS (${Synthetic.mapsDataSql}),
           |elements AS (${Synthetic.elementsSql}),
           |single_pos AS (
           |  SELECT rgd_id, start_pos, chromosome FROM (
           |    SELECT rgd_id, start_pos, chromosome,
           |           count(*) OVER (PARTITION BY rgd_id) AS n_pos
           |    FROM maps_data WHERE chromosome <> 'Y')
           |  WHERE n_pos = 1),
           |keptcv AS (
           |  SELECT c.* FROM clinvar c
           |  WHERE object_type IN ('single nucleotide variant','deletion',
           |          'insertion','duplication')
           |    AND ref_nuc IS NOT NULL AND length(ref_nuc) > 0
           |    AND (ref_nuc = '-' OR regexp_full_match(ref_nuc, '[ACGTN]+'))
           |    AND var_nuc IS NOT NULL AND length(var_nuc) > 0
           |    AND (var_nuc = '-' OR regexp_full_match(var_nuc, '[ACGTN]+'))
           |    AND EXISTS (SELECT 1 FROM elements e WHERE e.rgd_id = c.rgd_id)),
           |backfill AS (
           |  SELECT rgd_id, symbol AS clinvar_id FROM elements
           |  WHERE lower(source) = 'clinvar')
           |SELECT p.chromosome, count(*) AS n_written,
           |  CAST(sum(p.start_pos) AS BIGINT) AS sum_pos,
           |  CAST(sum(CASE WHEN c.rs_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_rs,
           |  CAST(sum(CASE WHEN b.clinvar_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
           |  CAST(count(DISTINCT b.clinvar_id) AS BIGINT) AS n_clinvar_ids,
           |  min(concat('RGDID:', CAST(c.rgd_id AS STRING), ';', c.name)) AS first_vcf_id
           |FROM keptcv c
           |JOIN single_pos p ON c.rgd_id = p.rgd_id
           |LEFT JOIN backfill b ON c.rgd_id = b.rgd_id
           |GROUP BY p.chromosome ORDER BY p.chromosome""".stripMargin
      }),

    // ============ q82: end-to-end post-processing slice ===============
    // The §3.3 heart of the reference (`VariantPostProcessing.java:157-551`)
    // with the DNA coming from the FASTA *chunk table* instead of inline
    // synthesis: variants ⋈ exon features (binned interval join, J1) →
    // exon DNA fetched by a shuffled (chr, chunk_idx) equi-join against
    // Fasta.toChunks output (S5 — DNA travels to executors, never
    // broadcast) → per-transcript CDS assembly (A10) → SNV application,
    // strand flip, codon translation, synonymous call (X17-X21), same
    // math as q60. A variant hits EVERY covering transcript (the
    // reference's per-variant transcript loop), not just its origin.
    // 100 TB: the chunk join replaces the reference's driver-side mmap
    // (`ChrFastaFile.java:20-102`) — the genome shards across executors
    // keyed by (chr, chunk_idx); exon rows replicate onto at most 2
    // chunks at width 128; the interval join is the binned equi-join
    // shape, no BNLJ.
    Q("q82_postprocess_fasta",
      (spark, dir) => {
        val W = 128
        val bases = typedlit(Seq("A", "C", "G", "T"))
        // genome: 25 chromosomes x 800bp, deterministic per-base
        val chrs = table(spark, dir, "nation").select((col("n_nationkey") + 1).as("c"))
        val headers = chrs.select((col("c") * 10000).as("line_id"),
          concat(lit(">chr"), col("c")).as("line"))
        val seqLines = chrs.withColumn("i", explode(sequence(lit(1), lit(20))))
          .select((col("c") * 10000 + col("i")).as("line_id"),
            array_join(transform(sequence(lit(1), lit(40)),
              j => element_at(bases,
                ((col("c") * 7 + col("i") * 3 + j) % 4 + 1).cast("int"))), "").as("line"))
        // no checkpoint on the chunk table (r17): unlike q72, where the
        // parse feeds 5 extracts, q82 consumes it exactly once (the
        // pieces join below) — an eager materialization here was one
        // extra full pass for nothing
        val chunks = graft.sources.Fasta.toChunks(
          graft.sources.Fasta.parseLines(headers.unionByName(seqLines)), width = W)
        // transcripts: 2-3 exons in genomic order, disjoint 250bp bands
        val t = table(spark, dir, "part").select(
          col("p_partkey").as("tid"),
          (col("p_partkey") % 2 + 2).cast("int").as("n_exons"),
          when(col("p_partkey") % 2 === 1, "-").otherwise("+").as("strand"),
          concat(lit("chr"), col("p_partkey") % 25 + 1).as("chr"))
        val ex = t.withColumn("exon_idx", explode(sequence(lit(0), col("n_exons") - 1)))
          .withColumn("e_start",
            (lit(37) + col("exon_idx") * 250 + (col("tid") * 53) % 190).cast("long"))
          .withColumn("e_len", (lit(24) + (col("tid") * 7 + col("exon_idx") * 13) % 33).cast("int"))
          .withColumn("e_stop", col("e_start") + col("e_len") - 1)
        // exon DNA: explode exon onto covering chunks, equi-join, concat
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
          // consumed twice (cds aggregation + hits interval join) —
          // materialize once so the chunk join + assembly run a single time
          .localCheckpoint(true)
        val cds = exd.groupBy(col("tid"), col("strand"))
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("exon_idx"), col("dna")))),
            x => x("dna")), "").as("cds"))
        // variants: one SNV per origin transcript, then matched to ALL
        // covering exons by (chr, position) — identity forgotten
        val hk = col("p_partkey") % (col("p_partkey") % 2 + 2)
        val vlen = lit(24) + (col("p_partkey") * 7 + hk * 13) % 33
        val v = table(spark, dir, "part").select(
          col("p_partkey").as("vid"),
          concat(lit("chr"), col("p_partkey") % 25 + 1).as("v_chr"),
          (lit(37) + hk * 250 + (col("p_partkey") * 53) % 190
            + (col("p_partkey") * 13) % vlen).cast("long").as("g_pos"),
          element_at(bases, ((col("p_partkey") * 17 + 3) % 4 + 1).cast("int")).as("var_base"))
        val hits = graft.operators.RangeJoin.pointInInterval(
            v, exd.drop("dna"), Seq("v_chr"), Seq("chr"),
            "g_pos", "e_start", "e_stop", binSize = 256L)
          .withColumn("rel_pos", col("prior_len") + (col("g_pos") - col("e_start")) + 1)
          .select(col("vid"), col("tid"), col("rel_pos"), col("var_base"))
        // Codon-local evaluation: the mutated codon occupies coding-strand
        // positions [3*aa_pos-2, 3*aa_pos]; on '-' that maps to stored
        // positions [len-3*aa_pos+1, len-3*aa_pos+3] read back
        // reverse-complemented, and the variant base lands at codon
        // offset rel2-3*aa_pos+3 (complemented on '-'). Cutting 3 bases
        // beats materializing var_cds + reverse-complementing the whole
        // CDS per (variant, transcript) row — O(1) vs O(|CDS|) per hit,
        // which is the real cost at genome scale where CDS are kilobases
        // and a variant fans out to every overlapping transcript.
        val asm = hits.join(cds, "tid")
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
                  DnaFunctions.reverseComplement(col("var_base")))
                  .otherwise(col("var_base")),
                (col("rel2") - col("aa_pos") * 3 + 3).cast("int"))))
          .withColumn("ref_aa",
            when(col("triplet_error") === "T", "skipped")
              .otherwise(DnaFunctions.translateCodon(col("ref_codon"))))
          .withColumn("var_aa",
            when(col("triplet_error") === "T", "skipped")
              .otherwise(DnaFunctions.translateCodon(col("var_codon"))))
          .withColumn("syn_status",
            when(col("triplet_error") === "T", "skipped")
              .otherwise(VariantFunctions.synStatus(col("ref_aa"), col("var_aa"))))
        asm.groupBy(col("strand"), col("triplet_error"), col("syn_status"))
          .agg(count(lit(1)).as("cnt"), sum(col("aa_pos")).as("sum_aa_pos"),
            sum(col("rel2")).as("sum_rel_pos"), sum(col("vid")).as("sum_vid"))
          .orderBy(col("strand"), col("triplet_error"), col("syn_status"))
      },
      Some {
        val revcomp = (c: String) => s"reverse(translate(upper($c), 'ACGT', 'TGCA'))"
        s"""WITH chrs AS (SELECT n_nationkey + 1 AS c FROM nation),
           |ln AS (
           |  SELECT c, i, string_agg(ch, '' ORDER BY j) AS line
           |  FROM (SELECT c, i, j, ['A','C','G','T'][(c*7 + i*3 + j) % 4 + 1] AS ch
           |        FROM chrs, generate_series(1, 20) s(i), generate_series(1, 40) t(j))
           |  GROUP BY c, i),
           |chrseq AS (SELECT c, string_agg(line, '' ORDER BY i) AS seq FROM ln GROUP BY c),
           |t AS (
           |  SELECT p_partkey AS tid, CAST(p_partkey % 2 + 2 AS INT) AS n_exons,
           |    CASE WHEN p_partkey % 2 = 1 THEN '-' ELSE '+' END AS strand,
           |    (p_partkey % 25) + 1 AS chrn
           |  FROM part),
           |ex AS (
           |  SELECT tid, n_exons, strand, chrn, exon_idx,
           |    CAST(37 + exon_idx * 250 + (tid * 53) % 190 AS BIGINT) AS e_start,
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
           |v AS (
           |  SELECT p_partkey AS vid, (p_partkey % 25) + 1 AS chrn,
           |    CAST(37 + (p_partkey % (p_partkey % 2 + 2)) * 250 + (p_partkey * 53) % 190
           |      + (p_partkey * 13) % (24 + (p_partkey * 7 + (p_partkey % (p_partkey % 2 + 2)) * 13) % 33)
           |      AS BIGINT) AS g_pos,
           |    substr('ACGT', CAST((p_partkey * 17 + 3) % 4 AS INT) + 1, 1) AS var_base
           |  FROM part),
           |hits AS (
           |  SELECT v.vid, e.tid, e.prior_len + (v.g_pos - e.e_start) + 1 AS rel_pos, v.var_base
           |  FROM v JOIN exd e ON v.chrn = e.chrn AND v.g_pos BETWEEN e.e_start AND e.e_stop),
           |asm AS (
           |  SELECT h.vid, h.tid, c.strand, c.cds, h.rel_pos,
           |    substr(c.cds, 1, CAST(h.rel_pos - 1 AS INT)) || h.var_base
           |      || substr(c.cds, CAST(h.rel_pos + 1 AS INT)) AS var_cds
           |  FROM hits h JOIN cds c ON c.tid = h.tid),
           |ori AS (
           |  SELECT vid, strand,
           |    CASE WHEN strand = '-' THEN ${revcomp("cds")} ELSE cds END AS cds2,
           |    CASE WHEN strand = '-' THEN ${revcomp("var_cds")} ELSE var_cds END AS var_cds2,
           |    CASE WHEN strand = '-' THEN length(cds) - rel_pos + 1 ELSE rel_pos END AS rel2
           |  FROM asm),
           |fin AS (
           |  SELECT *, CASE WHEN rel2 > 3 * (length(cds2) // 3) THEN 'T' ELSE 'F' END AS triplet_error,
           |    CASE WHEN rel2 > 3 * (length(cds2) // 3) THEN 0 ELSE (rel2 + 2) // 3 END AS aa_pos
           |  FROM ori),
           |aa AS (
           |  SELECT vid, strand, triplet_error, CAST(aa_pos AS BIGINT) AS aa_pos, rel2,
           |    CASE WHEN triplet_error = 'T' THEN 'skipped'
           |         ELSE ${QueriesGenomic.codonCaseSql("substr(cds2, CAST(3 * aa_pos - 2 AS INT), 3)")} END AS ref_aa,
           |    CASE WHEN triplet_error = 'T' THEN 'skipped'
           |         ELSE ${QueriesGenomic.codonCaseSql("substr(var_cds2, CAST(3 * aa_pos - 2 AS INT), 3)")} END AS var_aa
           |  FROM fin)
           |SELECT strand, triplet_error,
           |  CASE WHEN triplet_error = 'T' THEN 'skipped'
           |       WHEN ref_aa = 'X' OR var_aa = 'X' THEN 'unassignable'
           |       WHEN ref_aa = var_aa THEN 'synonymous'
           |       ELSE 'nonsynonymous' END AS syn_status,
           |  count(*) AS cnt, CAST(sum(aa_pos) AS BIGINT) AS sum_aa_pos,
           |  CAST(sum(rel2) AS BIGINT) AS sum_rel_pos,
           |  CAST(sum(vid) AS BIGINT) AS sum_vid
           |FROM aa
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
      }),

    // ============ q90: cross-chromosome exon patch (J16) ==============
    // `VariantPostProcessing.getProperChunk:1281-1300`: an exon whose
    // transcript has a map row on a DIFFERENT chromosome at the SAME
    // start takes its DNA from that row's (chr, start, stop); same-chr
    // map rows are skipped (they do not shadow a cross-chr row), and
    // with no cross-chr row the local interval stands. Gate fixture:
    // every 3rd transcript's exon 1 carries a cross-chr map row (next
    // chromosome, stop stretched by tid%5); every 2nd carries a same-chr
    // DECOY row at the same start — if the operator ever selects a
    // decoy, the patched flag, source chromosome, fetched DNA and its
    // fingerprint all diverge. DNA comes through the same chunk
    // equi-join as q82 (never a genome broadcast).
    Q("q90_cross_chr_patch",
      (spark, dir) => {
        val W = 128
        val bases = typedlit(Seq("A", "C", "G", "T"))
        val chrs = table(spark, dir, "nation").select((col("n_nationkey") + 1).as("c"))
        val headers = chrs.select((col("c") * 10000).as("line_id"),
          concat(lit(">chr"), col("c")).as("line"))
        val seqLines = chrs.withColumn("i", explode(sequence(lit(1), lit(20))))
          .select((col("c") * 10000 + col("i")).as("line_id"),
            array_join(transform(sequence(lit(1), lit(40)),
              j => element_at(bases,
                ((col("c") * 7 + col("i") * 3 + j) % 4 + 1).cast("int"))), "").as("line"))
        val chunks = graft.sources.Fasta.toChunks(
          graft.sources.Fasta.parseLines(headers.unionByName(seqLines)), width = W)
          .withColumnRenamed("chr", "c_chr")
          .withColumnRenamed("chunk_idx", "c_idx")
        // (r17: no checkpoint — single consumer, the DNA-fetch join
        // below; same reasoning as q82's chunk table)
        val t = table(spark, dir, "part").select(
          col("p_partkey").as("tid"),
          (col("p_partkey") % 2 + 2).cast("int").as("n_exons"),
          (col("p_partkey") % 25 + 1).as("chrn"))
        val ex = t.withColumn("exon_idx", explode(sequence(lit(0), col("n_exons") - 1)))
          .withColumn("start",
            (lit(37) + col("exon_idx") * 250 + (col("tid") * 53) % 190).cast("long"))
          .withColumn("e_len", (lit(24) + (col("tid") * 7 + col("exon_idx") * 13) % 33).cast("int"))
          .withColumn("stop", col("start") + col("e_len") - 1)
          .withColumn("chr", concat(lit("chr"), col("chrn")))
        val crossRows = ex.filter(col("tid") % 3 === 0 && col("exon_idx") === 1)
          .select(col("tid"),
            concat(lit("chr"), (col("chrn") % 25) + 1).as("m_chr"),
            col("start").as("m_start"),
            (col("stop") + col("tid") % 5).as("m_stop"))
        val decoys = ex.filter(col("tid") % 2 === 0 && col("exon_idx") === 1)
          .select(col("tid"), col("chr").as("m_chr"),
            col("start").as("m_start"), (col("start") + 9).as("m_stop"))
        val patched = graft.sources.Fasta.patchIntervals(
          ex.select("tid", "exon_idx", "chr", "start", "stop"),
          crossRows.unionByName(decoys), "tid")
        val dna = patched
          .withColumn("from0", col("src_start") - 1)
          .withColumn("upto0", col("src_stop"))
          .withColumn("pc_idx", explode(sequence(
            (col("from0") / W).cast("int"), ((col("upto0") - 1) / W).cast("int"))))
          .join(chunks, col("src_chr") === col("c_chr") &&
            col("pc_idx") === col("c_idx"))
          .withColumn("cbase", col("pc_idx").cast("long") * W)
          .withColumn("cut_from", greatest(col("cbase"), col("from0")) - col("cbase"))
          .withColumn("cut_upto", least(col("cbase") + W, col("upto0")) - col("cbase"))
          .withColumn("piece",
            expr("substring(seq, CAST(cut_from + 1 AS INT), CAST(cut_upto - cut_from AS INT))"))
          .groupBy(col("tid"), col("exon_idx"), col("patched"), col("src_chr"))
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("pc_idx"), col("piece")))),
            x => x("piece")), "").as("dna"))
        dna.groupBy(col("patched"), col("src_chr"))
          .agg(count(lit(1)).as("n_exons"),
            sum(length(col("dna")).cast("long")).as("sum_len"),
            sum(graft.functions.TextFunctions.fingerprint(col("dna"))).as("sum_fp"))
          .orderBy(col("patched"), col("src_chr"))
      },
      Some {
        val fp = (c: String) =>
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
             |  list_transform(string_split_regex($c, ''), ch -> CAST(ascii(ch) AS BIGINT))),
             |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
        s"""WITH chrs AS (SELECT n_nationkey + 1 AS c FROM nation),
           |ln AS (
           |  SELECT c, i, string_agg(ch, '' ORDER BY j) AS line
           |  FROM (SELECT c, i, j, ['A','C','G','T'][(c*7 + i*3 + j) % 4 + 1] AS ch
           |        FROM chrs, generate_series(1, 20) s(i), generate_series(1, 40) t(j))
           |  GROUP BY c, i),
           |chrseq AS (SELECT c, string_agg(line, '' ORDER BY i) AS seq FROM ln GROUP BY c),
           |t AS (
           |  SELECT p_partkey AS tid, CAST(p_partkey % 2 + 2 AS INT) AS n_exons,
           |    (p_partkey % 25) + 1 AS chrn
           |  FROM part),
           |ex AS (
           |  SELECT tid, chrn, exon_idx,
           |    CAST(37 + exon_idx * 250 + (tid * 53) % 190 AS BIGINT) AS e_start,
           |    CAST(24 + (tid * 7 + exon_idx * 13) % 33 AS INT) AS e_len
           |  FROM t, LATERAL (SELECT unnest(generate_series(0, n_exons - 1)) AS exon_idx)),
           |ex2 AS (SELECT *, e_start + e_len - 1 AS e_stop FROM ex),
           |cross_m AS (
           |  SELECT tid, (chrn % 25) + 1 AS m_chrn, e_start AS m_start,
           |    e_stop + tid % 5 AS m_stop
           |  FROM ex2 WHERE tid % 3 = 0 AND exon_idx = 1),
           |patched AS (
           |  SELECT e.tid, e.exon_idx,
           |    m.tid IS NOT NULL AS patched,
           |    COALESCE(m.m_chrn, e.chrn) AS src_chrn,
           |    e.e_start AS src_start,
           |    COALESCE(m.m_stop, e.e_stop) AS src_stop
           |  FROM ex2 e LEFT JOIN cross_m m
           |    ON m.tid = e.tid AND m.m_start = e.e_start),
           |dna AS (
           |  SELECT p.patched, 'chr' || CAST(p.src_chrn AS VARCHAR) AS src_chr,
           |    substr(cs.seq, CAST(p.src_start AS INT),
           |      CAST(p.src_stop - p.src_start + 1 AS INT)) AS dna
           |  FROM patched p JOIN chrseq cs ON cs.c = p.src_chrn)
           |SELECT patched, src_chr, count(*) AS n_exons,
           |  CAST(sum(length(dna)) AS BIGINT) AS sum_len,
           |  CAST(sum(${fp("dna")}) AS BIGINT) AS sum_fp
           |FROM dna GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      })
  )
}
