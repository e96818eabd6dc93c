package graft.queries

import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** The JDBC output boundary (K2/K5/K8) executed against a REAL database:
  * embedded Derby, which ships with the Spark distribution's jars. The
  * reference's sink is Spring `BatchSqlUpdate` — 10k-row batched INSERTs
  * (`VariantProcessingBase.java:225-240`) and row-wise batched UPDATE
  * fixups (`VariantProcessingBase.java:277-294`). Here the same boundary
  * is one batched `DataFrameWriter.jdbc` append plus one staging table +
  * a single set-based MERGE — no per-row round trips, and the MERGE is
  * one transactional statement on the database no matter how many
  * executors staged the delta.
  *
  * Scale note: the append is executor-parallel (`numPartitions`
  * connections, `batchsize` rows per round trip — the knobs that matter
  * at 100 TB are those two and the staging-table MERGE replacing O(rows)
  * UPDATE statements with O(1) statements); Derby-in-a-directory is just
  * the smallest database that makes the path executable in this
  * environment.
  */
object QueriesJdbc {

  def all: Seq[Q] = Seq(

    // K2 (batched INSERT, batchsize 10000) + K5 (staging + MERGE upsert)
    // + S6 (partition-per-predicate read-back), end to end on Derby.
    // Base load: every 8th synthetic variant. Delta: a depth bump for
    // the vid%3 rows (MERGE matched -> UPDATE) plus re-keyed vid%7 rows
    // (not matched -> INSERT; %7 is satisfiable inside the %8 base —
    // vid = l_orderkey*10 + l_linenumber makes vid%5==0 force
    // l_linenumber=5, an odd value the even-vid base excludes, so a %5
    // stratum would leave the INSERT branch provably empty). The oracle
    // computes the expected
    // post-MERGE table state from the same parquet inputs, so a broken
    // batch write, a mis-fired MERGE branch, or a lossy type round trip
    // (e.g. empty-string ref_nuc for insertions) all hash-mismatch.
    Q("q105_jdbc_roundtrip",
      (spark, dir) => {
        val fixDir = QueriesSources.FixtureDir
        val dbDir = s"$fixDir/derby_q105"
        System.setProperty("derby.stream.error.file", s"$fixDir/derby.log")
        new java.io.File(fixDir).mkdirs()
        // boot down + delete any previous incarnation so the gate is
        // idempotent within one JVM and across runs
        Jdbc.shutdownEmbeddedDerby(dbDir)
        Fixtures.rmrf(new java.io.File(dbDir))
        val url = s"jdbc:derby:$dbDir;create=true"
        val props = new java.util.Properties()
        props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        // pin strings to VARCHAR: Derby's dialect default is CLOB,
        // which cannot be compared or merged on
        val varcharTypes =
          "chromosome VARCHAR(8), ref_nuc VARCHAR(16), var_nuc VARCHAR(16)"
        // vid is deliberately non-unique in the synthetic corpus (the
        // in-batch-dedup operators feed on that); MERGE requires unique
        // source keys, so start from the staged unique-vid base (the
        // %8 filter is on the group key, so filtering the staged
        // aggregate equals aggregating the filtered rows) — this gate
        // tests the JDBC boundary, not dedup (q63 does that)
        val v = Fixtures.dedupVariants(spark, dir)
          .filter(col("vid") % 8 === 0)
          .select(col("vid"), col("chromosome"),
            col("start_pos").cast("int").as("start_pos"),
            col("ref_nuc"), col("var_nuc"),
            col("total_depth").cast("int").as("total_depth"))
        Jdbc.append(v, url, "variant", props,
          batchSize = Jdbc.DefaultBatchSize, numPartitions = Some(4),
          columnTypes = Some(varcharTypes))
        val delta = v.filter(col("vid") % 3 === 0)
          .withColumn("total_depth", col("total_depth") + lit(1000))
          .unionByName(v.filter(col("vid") % 7 === 0)
            .withColumn("vid", col("vid") + lit(10000000L)))
        val merge = Jdbc.stageForMerge(delta, url, "variant_stage", "variant",
          keyCols = Seq("vid"),
          setCols = Seq("chromosome", "start_pos", "ref_nuc", "var_nuc",
            "total_depth"),
          props, columnTypes = Some(varcharTypes))
        // index the merge key on both sides BEFORE executing: Derby's
        // MERGE is a nested-loop match without one (quadratic — 20+
        // minutes at 60k rows; the reference's Oracle tables get this
        // index for free from their PKs)
        Jdbc.createIndex(url, "variant", Seq("vid"), "variant_vid_ix", props)
        Jdbc.createIndex(url, "variant_stage", Seq("vid"), "stage_vid_ix", props)
        Jdbc.execute(url, merge, props)
        val back = Jdbc.readPartitioned(spark, url, "variant",
          Fixtures.modPredicates("vid", 2), props)
          .select(col("vid"), col("chromosome"), col("start_pos"),
            col("ref_nuc"), col("var_nuc"), col("total_depth"))
          .orderBy(col("vid"))
          // materialize BEFORE the database is booted down
          .localCheckpoint(true)
        Jdbc.shutdownEmbeddedDerby(dbDir)
        back
      },
      Some(
        s"""WITH variants AS (${Synthetic.variantsSql}),
           |v AS (
           |  SELECT vid, min(chromosome) AS chromosome,
           |    CAST(min(start_pos) AS INT) AS start_pos,
           |    min(ref_nuc) AS ref_nuc, min(var_nuc) AS var_nuc,
           |    CAST(min(total_depth) AS INT) AS total_depth
           |  FROM variants WHERE vid % 8 = 0 GROUP BY vid)
           |SELECT vid, chromosome, start_pos, ref_nuc, var_nuc,
           |  CASE WHEN vid % 3 = 0 THEN total_depth + 1000
           |       ELSE total_depth END AS total_depth
           |FROM v
           |UNION ALL
           |SELECT vid + 10000000, chromosome, start_pos, ref_nuc, var_nuc,
           |  total_depth
           |FROM v WHERE vid % 7 = 0
           |ORDER BY 1""".stripMargin))
  )
}
