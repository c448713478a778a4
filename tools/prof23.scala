// Round-7 probe: duplication scaling for dedup_canonicalize. The op is
// linear by construction (band window + three keyed aggs + one doc_id
// join — no pair enumeration anywhere), but it sits directly on the
// LSH-star labeling whose buckets grow with duplication MULTIPLICITY,
// so this checks the claim the same way prof21 checked the star edges:
// replicate the corpus n× with distinct ids and identical payloads and
// watch the ratio stay ~n, not n².
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 16g \
//   -cp target/scala-2.13/classes -I tools/prof23.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

val d = "/root/testdata/sf0.1"
val root = "/tmp/prof23"

def timeIt(label: String, reps: Int = 3)(f: => Long): Double = {
  var best = Double.MaxValue
  var n = 0L
  for (_ <- 1 to reps) {
    val t0 = System.nanoTime()
    n = f
    best = math.min(best, (System.nanoTime() - t0) / 1e9)
  }
  println(f"[prof23] $label%-40s $best%8.2fs (rows=$n)")
  best
}

// n copies, distinct ids, identical payloads (true duplication) —
// n_chars kept: the keep-longest policy reads it
def repDocsDir(n: Int): String = {
  val out = s"$root/docs_n$n"
  graft.Tables.documents(spark, d)
    .crossJoin(spark.range(n).select(col("id").as("copy")))
    .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
      col("source"), col("lang"), col("text"), col("n_chars"))
    .write.mode("overwrite").parquet(s"$out/documents.parquet")
  out
}

for (n <- Seq(1, 10, 30)) {
  val dir = repDocsDir(n)
  timeIt(s"dedup_canonicalize n=$n") {
    graft.SparkEntry.queries("dedup_canonicalize")(spark, dir).count()
  }
}
