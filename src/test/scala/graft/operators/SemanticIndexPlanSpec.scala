package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}

/** Plan-shape guard for the r13 anti-join accept: the scale property
  * `artifacts/r13_mmlife_attrib.md` measures, locked into the suite.
  * acceptWave must plan as ONE cell-keyed anti join — the equi key
  * extracted from the compound (cell, cosine) condition — with the
  * only hash exchange on the wave side and the bucketed store scanned
  * exchange-free. A refactor that re-introduces the
  * join+distinct+anti shape (the O(|wave|·occupancy) match-set
  * materialization) or degrades the anti join to a nested-loop /
  * cartesian fails here, not in a benchmark diff. */
class SemanticIndexPlanSpec extends SparkSpec {

  test("acceptWave: one cell-keyed anti join, store side exchange-free") {
    import spark.implicits._
    val tbl = "graft_acceptwave_planspec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val path = s"${graft.queries.Fixtures.scratchRoot}/acceptwave_planspec"
    graft.queries.Fixtures.rmrf(new java.io.File(path))
    val e = spark.range(200).toDF("vec_id")
      .withColumn("v", transform(sequence(lit(0), lit(7)),
        i => (col("vec_id") % 17 + i).cast("double")))
      .withColumn("nrm", sqrt(VF.normSq(col("v"))))
      .withColumn("qv", IvfKmeans.quantize(col("v"), 4000L))
    val cents = IvfKmeans.train(
      e.filter(col("vec_id") % 2 === 0).select(col("vec_id"), col("qv")),
      4, 1).localCheckpoint(true)
    val h = SemanticIndex.Handle(spark, tbl, path, cents, 2, 400000L)
    SemanticIndex.writeEpoch0(h, e.filter(col("vec_id") % 2 === 0))
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the large-store shape (tiny fixtures would broadcast
      // and mask a lost bucket-join) and skip the materialization so
      // the COMPLETE declarative plan is assertable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("graft.planOnly", "true")
      val p = SemanticIndex.acceptWave(h, e.filter(col("vec_id") % 2 === 1))
        .queryExecution.executedPlan.toString
      // the accept is a HASH/MERGE anti join (no match-set + distinct
      // + anti, and not a nested-loop anti): the equi key must have
      // been extracted from the compound (cell, cosine) condition
      assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) [^\\n]*LeftAnti".r
          .findFirstIn(p).isDefined,
        s"accept must plan as a keyed anti join\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian in accept\n$p")
      // the ONE allowed nested-loop leg is the centroid assignment —
      // a cross join against the K-row broadcast frame (q130's bound)
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
        s"unexpected nested-loop legs beyond the centroid broadcast\n$p")
      // hash exchanges may key by cell only (the wave's probe shuffle);
      // the bucketed store side enters the join without one
      val keys = "Exchange hashpartitioning\\(([^)]*)".r
        .findAllMatchIn(p).map(_.group(1)).toList
      // the probe column is `cell#N`; the store-side key is `icell#N`
      // and must NOT slip through on the substring — match the word
      // boundary and reject icell explicitly so this assertion guards
      // the store-side bucket-scan property on its own
      val bad = keys.filterNot(k =>
        "(^|[^A-Za-z0-9_])cell#".r.findFirstIn(k).isDefined &&
          !k.contains("icell#"))
      assert(bad.isEmpty,
        s"only the wave's cell shuffle may hash-exchange (found: $bad)\n$p")
      assert(keys.size <= 1,
        s"store side must stay exchange-free (bucket scan): $keys\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.unset("graft.planOnly")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
