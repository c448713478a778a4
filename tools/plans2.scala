import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.01"
def dump(name: String): Unit = {
  println(s"===== $name =====")
  graft.SparkEntry.queries(name)(spark, d).explain("formatted")
}
dump("ann_ivf_topk")
dump("p2_pdf_analyze")
dump("s3_pdf_roundtrip")
dump("dedup_clusters")
System.exit(0)
