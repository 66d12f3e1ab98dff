package graft

import java.nio.file.{Files, Paths}
import graft.etl.DelotonPipeline
import org.apache.spark.sql.functions.col

/** The `graftlog` DataSource V2 driven through the public read API:
  * schema/offsets, column pruning, stream-equality pushdown (whole-file
  * skip, observable as the partition count), and the ETL running
  * unchanged on top of the source.
  */
class LogSourceSpec extends SparkSpecBase {

  private def msg(ts: String, line: String): String = s"""{"log": "$ts $line"}"""

  private def writeLogs(dir: String, stream: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, s"$stream.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

  private def fixture(): String = {
    val dir = tmpDir()
    writeLogs(dir, "bike-1", Seq(
      msg("2024-01-01 12:00:00.000", "[INFO]: --------- beginning of a new ride"),
      msg("2024-01-01 12:00:01.000", "[INFO]: Getting user data from server"),
      msg("2024-01-01 12:00:02.000", "[INFO]: Ride - duration = 1.0; resistance = 30")))
    writeLogs(dir, "bike-2", Seq(
      msg("2024-01-02 09:00:00.000", "[INFO]: --------- beginning of a new ride"),
      msg("2024-01-02 09:00:01.000", "[INFO]: Telemetry - hrt = 84; rpm = 27; power = 5.25")))
    dir
  }

  test("reads (stream, offset, value): stream = basename, offsets 0-based per file") {
    val dir = fixture()
    val out = DelotonPipeline.readLogs(spark, dir)
    assert(out.schema == graft.sources.LogSource.Schema)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq(("bike-1", 0L), ("bike-1", 1L), ("bike-1", 2L),
      ("bike-2", 0L), ("bike-2", 1L)))
    val v = out.filter(col("stream") === "bike-2" && col("offset") === 1).collect()
    assert(v.head.getString(2).contains("Telemetry"))
  }

  test("column pruning reaches the source: scan description lists only read columns") {
    val dir = fixture()
    val df = DelotonPipeline.readLogs(spark, dir).select("value")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("graftlog"), plan)
    assert(plan.contains("columns=value") && !plan.contains("columns=stream"),
      "scan must materialize only the value column:\n" + plan)
    assert(df.collect().length == 5)
  }

  test("stream-equality pushdown skips whole files: 1 partition instead of 2") {
    val dir = fixture()
    val all = DelotonPipeline.readLogs(spark, dir)
    val one = all.filter(col("stream") === "bike-2")
    assert(all.rdd.getNumPartitions == 2, "one partition per file expected")
    assert(one.rdd.getNumPartitions == 1,
      "pushed stream filter must prune the non-matching file's partition")
    assert(one.collect().forall(_.getString(0) == "bike-2"))
    val plan = one.queryExecution.executedPlan.toString()
    assert(plan.contains("pushed stream=bike-2"), "pushdown must be visible in the scan:\n" + plan)
    // a filter the source does NOT handle stays in the plan as residual
    val residual = DelotonPipeline.readLogs(spark, dir).filter(col("offset") > 0)
    assert(residual.collect().length == 3)
  }

  test("the ETL runs unchanged on the DSv2 source") {
    val dir = fixture()
    val parsed = DelotonPipeline.parsed(DelotonPipeline.readLogs(spark, dir))
    val rows = parsed.select("stream", "ride_id", "is_marker", "is_ride", "is_telemetry")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // each stream's marker starts its own ride 1 — state never crosses files
    assert(rows.count(_ == ("bike-1", 1L)) == 3)
    assert(rows.count(_ == ("bike-2", 1L)) == 2)
  }
}
