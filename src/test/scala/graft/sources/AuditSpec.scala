package graft.sources

import graft.SparkSpec

/** K10 audit sink (`VariantProcessingBase.insertSystemLogMessage:
  * 64-75`): one row per event, appended, with the reference's
  * SYSTEM_LOG column shape. */
class AuditSpec extends SparkSpec {

  test("logMessage appends one typed row per event") {
    val path = java.nio.file.Files.createTempDirectory("graft-audit").toString + "/system_log"
    Audit.logMessage(spark, path, "variant-load", "started sample 42")
    Audit.logMessage(spark, path, "variant-load", "finished sample 42", floatValue = 1234.0)
    val rows = Audit.read(spark, path)
    assert(rows.columns.toSeq == Seq("system_component", "log_level",
      "event_date", "string_value", "float_value"))
    assert(rows.count() == 2)
    val byMsg = rows.collect().map(r =>
      r.getAs[String]("string_value") -> r).toMap
    assert(byMsg.keySet == Set("started sample 42", "finished sample 42"))
    assert(byMsg.values.forall(_.getAs[String]("log_level") == "Info"))
    assert(byMsg.values.forall(_.getAs[String]("system_component") == "variant-load"))
    assert(byMsg("finished sample 42").getAs[Double]("float_value") == 1234.0)
    assert(byMsg.values.forall(_.getAs[java.sql.Timestamp]("event_date") != null))
  }
}
