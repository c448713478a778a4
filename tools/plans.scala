import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.01"
def dump(name: String): Unit = {
  println(s"===== $name =====")
  graft.SparkEntry.queries(name)(spark, d).explain("formatted")
}
dump("f2_size_filter")
dump("j1_enrich_broadcast")
dump("v1_cosine_topk")
dump("dedup_minhash_lsh")
dump("search_e2e")
System.exit(0)
