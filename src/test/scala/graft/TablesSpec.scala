package graft

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard for the driver-generated tables.
  *
  * The regression class that bit round 9: the driver regenerated
  * `events.parquet` with `ts` as TIMESTAMP(MICROS, isAdjustedToUTC=0)
  * (was TIMESTAMP(NANOS)), `Tables.events` only normalized the old
  * shape, and the two `unix_micros(ts)` consumers failed analysis —
  * silently, because Verify swallowed the throw. This spec makes the
  * contract explicit: whatever physical shape the parquet carries,
  * `Tables.events` yields exactly one canonical `ts` type, and every
  * events-consuming query at least analyzes (forcing `.schema` runs the
  * analyzer without executing the plan).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)

  test("events.ts normalizes to TimestampType at every SF") {
    assert(sfDirs.nonEmpty, "no testdata SF dirs found")
    sfDirs.foreach { d =>
      val t = Tables.events(spark, d).schema("ts").dataType
      assert(t == TimestampType, s"$d: events.ts resolved as $t, want TimestampType")
    }
  }

  // Every SparkEntry query whose plan reads the events table. Kept in
  // sync by the existence assertion below — a renamed query fails loudly.
  private val eventsConsumers = Seq(
    "f5_retry_filter", "a1_status_stats", "a1_single_pass", "a4_progress",
    "v6_sort_limit", "asof_join", "range_join_1h", "skew_salted_agg",
    "count_distinct_users", "quantiles_value", "a2_avg_value",
    "t1_window_agg", "session_window_agg", "sessionize", "v5_resort")

  test("every events-consuming query analyzes against current testdata") {
    val qs = SparkEntry.queries
    val missing = eventsConsumers.filterNot(qs.contains)
    assert(missing.isEmpty, s"stale consumer list — not in queries: $missing")
    eventsConsumers.foreach { name =>
      // .schema forces analysis (the phase that threw in r9) w/o execution
      val fields = qs(name)(spark, "/root/testdata/sf0.001").schema.fieldNames
      assert(fields.nonEmpty, s"$name produced an empty schema")
    }
  }

  // The same drift class for the other two driver-generated tables the
  // engine leans on hardest: pin the columns the query surface consumes
  // (names + type family, not exact physical types — a benign width
  // change shouldn't fail, a rename or kind change should).
  test("documents and embeddings carry the columns the query surface consumes") {
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val fractional: Set[DataType] = Set(FloatType, DoubleType)
    sfDirs.foreach { d =>
      val doc = Tables.documents(spark, d).schema
      assert(integral(doc("doc_id").dataType), s"$d doc_id: ${doc("doc_id").dataType}")
      assert(doc("text").dataType == StringType)
      assert(doc("lang").dataType == StringType)
      assert(doc("source").dataType == StringType)
      assert(integral(doc("n_chars").dataType), s"$d n_chars: ${doc("n_chars").dataType}")
      val emb = Tables.embeddings(spark, d).schema
      assert(integral(emb("vec_id").dataType), s"$d vec_id: ${emb("vec_id").dataType}")
      emb("embedding").dataType match {
        case ArrayType(et, _) => assert(fractional(et), s"$d embedding element: $et")
        case other => fail(s"$d embedding: expected array, got $other")
      }
    }
  }
}
