// Dump + oracle a SUBSET of queries for fast local iteration.
// Run: SUBSET="q1,q2" SF=/root/testdata/sf0.01 OUT=/tmp/v13 \
//   spark-shell --master local[8] --driver-class-path target/scala-2.13/classes \
//   -I tools/verify_subset.scala   && python3 tools/check.py $SF $OUT
val names = sys.env.getOrElse("SUBSET", "").split(",").map(_.trim).filter(_.nonEmpty).toSet
val sf = sys.env.getOrElse("SF", "/root/testdata/sf0.01")
val out = sys.env.getOrElse("OUT", "/tmp/v13")
val qs = graft.SparkEntry.queries.filter { case (k, _) => names(k) }
val os = graft.SparkEntry.oracleSql.filter { case (k, _) => names(k) }
require(qs.nonEmpty, s"no queries matched $names")
graft.expressions.GraftFunctions.register(spark)
val errs = graft.Verify.dump(spark, sf, out, qs, os)
println(s"[verify_subset] dumped ${qs.size} queries, errors: $errs")
sys.exit(if (errs.nonEmpty) 1 else 0)
