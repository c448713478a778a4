package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared multiset-equality helpers for the persisted-index specs: two
  * relations are "the same table" iff their full row multisets match.
  * The sort key joins cells with U+0001 (written as an escape — raw
  * control bytes in source make git treat the file as binary), a
  * character the data never contains, so adjacent-column
  * concatenations cannot collide.
  */
object TableAssertions {
  def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("\u0001"))

  def assertSameTable(a: DataFrame, b: DataFrame, what: String): Unit = {
    val (ra, rb) = (sortedRows(a), sortedRows(b))
    assert(ra == rb, s"$what differ: ${ra.size} vs ${rb.size} rows")
  }
}
