package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Plan evidence for q97's layout claim: a partition-key filter over a
  * hive-partitioned parquet dataset must reach the scan as a
  * PARTITION filter (directory pruning before file listing), not a
  * post-scan data filter — at 100 TB the difference between touching
  * the matching directories and listing the whole corpus. */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  test("partition-key filter prunes directories at the scan") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_prune_spec"
    (0 until 1000).map(i => (i.toLong, s"lang${i % 5}", i % 100))
      .toDF("id", "lang", "v")
      .write.mode("overwrite").partitionBy("lang").parquet(path)

    val df = spark.read.parquet(path).filter($"lang" === "lang3")
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scan.nonEmpty, df.queryExecution.executedPlan.toString)
    // the lang predicate is a partition filter on the scan itself
    assert(scan.head.partitionFilters.exists(_.references.exists(_.name == "lang")),
      scan.head.partitionFilters.toString)
    // and the pruned listing touches exactly the one matching partition
    assert(scan.head.relation.location.listFiles(
      scan.head.partitionFilters, Nil).size == 1,
      "pruned listing should return only the matching partition")
    assert(df.count() == 200)
    // row-group/data filters still push separately for non-partition cols
    val df2 = spark.read.parquet(path).filter($"lang" === "lang3" && $"v" < 10)
    assert(df2.count() == 1000 / 5 / 10)
  }
}
