// Round-7 probe (VERDICT #5): 10x-30x duplication scaling for the
// round-6/7 stored paths — AnnLshIndex init/addBatch/search/searchInt8/
// refine and contamination_mass. Duplication (same payload, new ids) is
// the stress that caught the r4/r5 quadratic paths: it grows every
// blocking bucket (LSH signature, shingle df, md5 fp) by the
// duplication factor, so any candidate generator that is secretly
// O(bucket^2) blows up 100x-900x while a linear path grows 10x-30x.
//
// Expected (the claims this probe checks):
//   - init/refine: linear in corpus (full re-sign + rewrite)
//   - search/searchInt8: base + linear in the probed-bucket sliver
//     (candidates grow 10x/30x; the corpus scan behind DPP too — both
//     linear, NOT quadratic; ratios well under factor^2)
//   - the default maxBucket guard REFUSES (loudly, fast) once
//     duplication pushes a bucket past the cap — never silently slow
//   - contamination_mass: linear (df join output is |test shingles|
//     rows regardless of df; fp containment is group-then-join)
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 16g \
//   -cp target/scala-2.13/classes -I tools/prof21.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AnnLshIndex

val d = "/root/testdata/sf0.1"
val root = "/tmp/prof21"

def timeIt(label: String, reps: Int = 3)(f: => Long): Double = {
  var best = Double.MaxValue
  var n = 0L
  for (_ <- 1 to reps) {
    val t0 = System.nanoTime()
    n = f
    best = math.min(best, (System.nanoTime() - t0) / 1e9)
  }
  println(f"[prof21] $label%-40s $best%8.2fs (rows=$n)")
  best
}

// n copies, distinct ids, identical payloads (true duplication)
def repEmb(n: Int): DataFrame = {
  graft.Tables.embeddings(spark, d).
    crossJoin(spark.range(n).select(col("id").as("copy"))).
    select((col("vec_id") + col("copy") * 10000000L).as("vec_id"), col("embedding"))
}

def repDocsDir(n: Int): String = {
  val out = s"$root/docs_n$n"
  graft.Tables.documents(spark, d)
    .crossJoin(spark.range(n).select(col("id").as("copy")))
    .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
      col("source"), col("lang"), col("text"))
    .write.mode("overwrite").parquet(s"$out/documents.parquet")
  out
}

val queries20 = {
  graft.Tables.embeddings(spark, d).
    filter(col("vec_id") < 20).
    select(col("vec_id").as("q_id"), col("embedding").as("qv")).
    localCheckpoint()
}

val factors = Seq(1, 10, 30, 100)
val res = scala.collection.mutable.Map[(String, Int), Double]()

for (n <- factors) {
  val dir = s"$root/lsh_n$n"
  val e = repEmb(n).localCheckpoint()
  res(("init", n)) = timeIt(s"init n=$n (${2000L * n} vecs)", reps = 1) {
    AnnLshIndex.init(e, dir); spark.read.parquet(s"$dir/vectors").count()
  }
  // duplication inflates every bucket n-fold -> huge cap for measuring
  res(("search", n)) = timeIt(s"search n=$n k=3 p=2") {
    AnnLshIndex.search(spark, dir, queries20, k = 3, nProbes = 2,
      maxBucket = 1000000).count()
  }
  res(("searchInt8", n)) = timeIt(s"searchInt8 n=$n k=3 p=2") {
    AnnLshIndex.searchInt8(spark, dir, queries20, k = 3, nProbes = 2,
      maxBucket = 1000000).count()
  }
  res(("refine", n)) = timeIt(s"refine n=$n 8->14 planes", reps = 1) {
    AnnLshIndex.refine(spark, dir, 14); AnnLshIndex.numPlanes(spark, dir).toLong
  }
  // post-refine search at the SAME cap: 2^14 buckets shrink each bucket
  // 64x — the documented scale response to duplication-driven growth
  res(("searchRef", n)) = timeIt(s"search n=$n after refine") {
    AnnLshIndex.search(spark, dir, queries20, k = 3, nProbes = 2,
      maxBucket = 1000000).count()
  }
}

// the guard must refuse an over-cap bucket loudly and FAST (cap 500 <
// the ~900-row max bucket duplication built at 30x; the default 4096
// cap is legitimately not exceeded at this corpus size)
val guardDir = s"$root/lsh_guard"
AnnLshIndex.init(repEmb(30), guardDir)
val tGuard = System.nanoTime()
val guarded = try {
  AnnLshIndex.search(spark, guardDir, queries20, k = 3, nProbes = 2,
    maxBucket = 500).count()
  "NOT-REFUSED (BUG)"
} catch {
  case ex: Throwable if (Option(ex.getMessage).getOrElse("") +
    Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse(""))
    .contains("scale numPlanes") => "refused-loudly"
  case ex: Throwable => s"refused-oddly: ${ex.getClass.getSimpleName}: ${ex.getMessage.take(120)}"
}
println(f"[prof21] guard at 30x cap=500: $guarded in ${(System.nanoTime() - tGuard) / 1e9}%.2fs")

for (n <- factors) {
  val dir = repDocsDir(n)
  res(("contamination", n)) = timeIt(s"contamination_mass n=$n (${5000L * n} docs)") {
    graft.SparkEntry.queries("contamination_mass")(spark, dir).count()
  }
}

println("[prof21] op              " + factors.map(n => "%9s".format(n + "x")).mkString +
  factors.tail.map(n => "%6s".format("r" + n)).mkString)
for (op <- Seq("init", "search", "searchInt8", "refine", "searchRef", "contamination")) {
  val ts = factors.map(n => res((op, n)))
  println(f"[prof21] $op%-14s " + ts.map(t => f"$t%9.2f").mkString +
    ts.tail.map(t => f"${t / ts.head}%6.1f").mkString)
}
System.exit(0)
