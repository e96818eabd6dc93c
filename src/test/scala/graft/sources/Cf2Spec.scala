package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class Cf2Spec extends SparkSpec {

  test("malformed rows: bad numerics null out, row survives (PERMISSIVE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cf2-bad").toString
    val lines = Seq(
      "# header comment",
      // good row: 16 columns
      (Seq("1", "100", "A", "G", "rs1") ++ Seq("1", "2", "3", "4", "10") ++
        Seq("", "", "5", "1", "10", "")).mkString("\t"),
      // bad numeric position + short row (missing trailing columns)
      (Seq("2", "NOT_A_NUMBER", "C", "T", "") ++ Seq("1", "2", "3", "4", "10")).mkString("\t"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/bad.txt"),
      lines.mkString("\n"))
    val got = Cf2.read(spark, s"$dir/bad.txt").orderBy("chromosome").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "1" && got(0).getLong(1) == 100L)
    // PERMISSIVE mode: unparseable/missing fields become null, the scan
    // never throws mid-pipeline — QC filters decide what to drop
    assert(got(1).getString(0) == "2" && got(1).isNullAt(1))
    assert(got(1).isNullAt(15))
  }
  import spark.implicits._

  private def fixture = Seq(
    ("1", 1001L, "A", "C", "rs1", 5, 15, 0, 0, 20, "hgvs1", 101, 15, 2, 15, null: String),
    ("2", 2002L, null: String, "CG", null: String, 0, 0, 0, 0, 30, null: String, 102, 12, 1, 30, "A"),
    ("X", 3003L, "GT", null: String, "rs3", 0, 0, 0, 0, 10, null: String, 103, 8, 1, 10, "G"))
    .toDF(Cf2.schema.fieldNames: _*)

  test("TSV round-trip preserves schema and values (plain and gzip)") {
    for (codec <- Seq("none", "gzip")) {
      val dir = Files.createTempDirectory(s"cf2_$codec").toString
      Cf2.write(fixture, dir, compression = codec)
      val back = Cf2.read(spark, dir)
      assert(back.schema == Cf2.schema)
      val a = fixture.orderBy("position").collect().map(_.toSeq)
      val b = back.orderBy("position").collect().map(_.toSeq)
      assert(a.toSeq == b.toSeq, s"codec=$codec")
      if (codec == "gzip") {
        val files = new java.io.File(dir).listFiles().map(_.getName)
        assert(files.exists(_.endsWith(".csv.gz")), "gzip extension present")
      }
    }
  }

  test("comment lines are skipped on read") {
    val dir = Files.createTempDirectory("cf2_comment").toString
    val f = new java.io.File(dir, "part-0.csv")
    val pw = new java.io.PrintWriter(f)
    pw.println("#chr\tposition\tref...")
    pw.println("1\t500\tA\tG\t\t1\t2\t3\t4\t10\t\t7\t4\t1\t10\t")
    pw.close()
    val back = Cf2.read(spark, dir)
    assert(back.count() == 1)
    assert(back.select("position").collect().head.getLong(0) == 500L)
  }

  test("per-strain partitioned fan-out writes one directory per strain") {
    val dir = Files.createTempDirectory("cf2_strain").toString
    val df = fixture.withColumn("strain", concat(lit("S"), col("rgd_id") % 2))
    Cf2.write(df, dir, partitionBy = Seq("strain"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("strain=S0", "strain=S1"))
  }
}
