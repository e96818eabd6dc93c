package graft.streaming

import graft.SparkSpec
import graft.sources.Cf2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** End-to-end incremental load over a file-source stream: CF2 files
  * land in a directory; each micro-batch is upserted (anti-join) into a
  * parquet store — the streaming form of the reference's
  * `--verifyIfInRgd` load (SURVEY §2.10). */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("CF2 directory stream -> foreachBatch upsert parquet store") {
    val inDir = Files.createTempDirectory("cf2_stream_in").toString
    val storeDir = Files.createTempDirectory("cf2_store").toString + "/t"
    val ckpt = Files.createTempDirectory("cf2_ckpt").toString

    def cf2File(name: String, rows: Seq[(String, Long, String, String)]): Unit = {
      val pw = new java.io.PrintWriter(s"$inDir/$name")
      rows.foreach { case (chr, pos, ref, vn) =>
        pw.println(s"$chr\t$pos\t$ref\t$vn\t\t1\t2\t3\t4\t10\t\t7\t4\t1\t10\t")
      }
      pw.close()
    }
    // batch 1 and batch 2 overlap on (1, 500)
    cf2File("a.txt", Seq(("1", 500L, "A", "G"), ("2", 900L, "C", "T")))

    // seed the store empty
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Cf2.schema).write.mode("overwrite").parquet(storeDir)

    val stream = spark.readStream
      .schema(Cf2.schema)
      .option("sep", "\t").option("comment", "#").option("emptyValue", "")
      .csv(inDir)
    val keys = Seq("chromosome", "position", "ref_nuc", "var_nuc")
    def runOnce(): Unit = {
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val existing = spark.read.parquet(storeDir)
          StreamingOps.upsertBatch(batch, existing, keys)
            .write.mode("append").parquet(storeDir)
        }
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(storeDir).count() == 2)

    cf2File("b.txt", Seq(("1", 500L, "A", "G"), ("3", 100L, "G", "A")))
    runOnce()
    val rows = spark.read.parquet(storeDir)
      .select("chromosome", "position").orderBy("chromosome")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the overlapping (1,500) row was not duplicated
    assert(rows.toSeq == Seq(("1", 500L), ("2", 900L), ("3", 100L)))
  }
}
