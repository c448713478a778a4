package graft

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The correctness gate's own loudness: a throwing query must land in
  * `_errors.json` and the dump's return value — never silently vanish
  * from the round artifact (the r9 regression class: two broken queries
  * produced no output dirs and the round read as all-green).
  */
class VerifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a deliberately-broken query fails the dump visibly") {
    val out = Files.createTempDirectory("verify-spec").toString
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "good" -> ((s, _) => s.range(3).select(col("id"))),
      "broken" -> ((s, _) => s.range(1).select(expr("unix_micros(id)"))) // analysis error
    )
    val errors = Verify.dump(spark, "/unused", out, queries, Map("good" -> "SELECT 1"))
    assert(errors.keySet == Set("broken"))
    assert(errors("broken").nonEmpty)
    // the good query still dumped, the artifact files exist, and the
    // error landed in _errors.json
    assert(Files.exists(Paths.get(s"$out/good")))
    assert(!Files.exists(Paths.get(s"$out/broken")))
    val errJson = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("\"broken\""))
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json")).contains("\"good\""))
  }

  test("a clean dump returns no errors and writes an empty _errors.json") {
    val out = Files.createTempDirectory("verify-spec").toString
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "good" -> ((s, _) => s.range(3).select(col("id"))))
    val errors = Verify.dump(spark, "/unused", out, queries, Map("good" -> "SELECT 1"))
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")) == "{}")
  }
}
