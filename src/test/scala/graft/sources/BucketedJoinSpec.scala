package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables sort-merge join with no shuffle exchange") {
    val facts = (0 until 20000).map(i => (i.toLong % 700, i.toLong)).toDF("k", "v")
    val dims = (0 until 700).map(i => (i.toLong, s"d$i")).toDF("k2", "name")

    spark.sql("DROP TABLE IF EXISTS graft_fact_bkt")
    spark.sql("DROP TABLE IF EXISTS graft_dim_bkt")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketed.writeBucketed(facts, "graft_fact_bkt", 8, Seq("k"))
      Bucketed.writeBucketed(dims, "graft_dim_bkt", 8, Seq("k2"))
      // force a sort-merge plan so a shuffle would be visible if required
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_fact_bkt")
        .join(spark.table("graft_dim_bkt"), $"k" === $"k2")
      val plan = j.queryExecution.executedPlan.toString
      // both scans report the bucket HashPartitioning, so neither side
      // shuffles: the write-time shuffle is amortized over every join
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(j.count() == 20000)
      // same rows as the unbucketed join
      val plainCnt = facts.join(dims, $"k" === $"k2").count()
      assert(plainCnt == 20000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_fact_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_dim_bkt")
    }
  }

  test("bucket partitioning survives a column alias: only the other side shuffles") {
    // q99's shape: the persistent index is joined through a RENAMED
    // key column; alias-aware output partitioning must still let the
    // bucketed scan feed the sort-merge join exchange-free, so the
    // per-wave shuffle is the wave's, never the corpus's
    val docs = (0 until 5000).map(i => (i.toLong, i % 97)).toDF("doc_id", "v")
    spark.sql("DROP TABLE IF EXISTS graft_alias_bkt")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketed.writeBucketed(docs, "graft_alias_bkt", 8, Seq("doc_id"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val wave = (0 until 100).map(i => (i.toLong * 3, i.toLong)).toDF("idx_id", "w_id")
      val j = wave.join(
        spark.table("graft_alias_bkt").select($"doc_id".as("idx_id"), $"v"),
        "idx_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size == 1, plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(j.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_alias_bkt")
    }
  }
}
