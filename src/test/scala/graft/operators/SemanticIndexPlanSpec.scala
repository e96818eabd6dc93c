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

  test("foreignCovers: one cell-keyed inner join + (vec_id, fp) aggregate, store side exchange-free") {
    // q137's cover analysis shares acceptWave's scale property: the
    // fp-tagged store enters the cell join as a bucket scan, the probe
    // pays one cell shuffle, and the only other exchange is the
    // (vec_id, fp) aggregate's. A refactor that re-keys the store (to
    // fetch fp from a side table, say) or degrades the compound
    // condition to a nested loop fails here.
    import spark.implicits._
    val tbl = "graft_covers_planspec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val path = s"${graft.queries.Fixtures.scratchRoot}/covers_planspec"
    graft.queries.Fixtures.rmrf(new java.io.File(path))
    val e = spark.range(200).toDF("vec_id")
      .withColumn("fp", col("vec_id") % 50)
      .withColumn("v", transform(sequence(lit(0), lit(7)),
        i => (col("vec_id") % 17 + i).cast("double")))
      .withColumn("nrm", sqrt(VF.normSq(col("v"))))
      .withColumn("qv", IvfKmeans.quantize(col("v"), 4000L))
    val cents = IvfKmeans.train(e.select(col("vec_id"), col("qv")), 4, 1)
      .localCheckpoint(true)
    val h = SemanticIndex.Handle(spark, tbl, path, cents, 2, 400000L)
    graft.sources.Bucketed.writeBucketed(
      SemanticIndex.spilled(h, e, Seq("fp")).withColumn("epoch", lit(0)),
      tbl, 2, Seq("cell"), path = Some(path))
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = SemanticIndex.foreignCovers(h, e)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"cartesian in cover join\n$p")
      // the one allowed nested-loop leg is the K-row centroid broadcast
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
        s"unexpected nested-loop legs beyond the centroid broadcast\n$p")
      assert("(SortMergeJoin|ShuffledHashJoin) [^\\n]*Inner".r
          .findFirstIn(p).isDefined,
        s"cover join must plan as a keyed inner join\n$p")
      val keys = "Exchange hashpartitioning\\(([^)]*)".r
        .findAllMatchIn(p).map(_.group(1)).toList
      // allowed: the probe's cell shuffle and the aggregate's
      // (vec_id, fp) exchange; forbidden: anything keying the store
      // (icell) — the bucket scan must stay exchange-free
      val bad = keys.filterNot(k =>
        ("(^|[^A-Za-z0-9_])cell#".r.findFirstIn(k).isDefined &&
          !k.contains("icell#")) ||
          (k.contains("vec_id#") && k.contains("fp#")))
      assert(bad.isEmpty,
        s"only the probe cell shuffle and the aggregate may exchange (found: $bad)\n$p")
      assert(keys.size <= 2,
        s"store side must stay exchange-free (bucket scan): $keys\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
