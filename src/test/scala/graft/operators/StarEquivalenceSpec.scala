package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** dedup_minhash_star's contract: thinning each LSH bucket from all-pairs
  * to (bucket-min → member) star edges must not change the connected
  * components — co-members stay connected through the hub. This spec
  * computes components over both edge sets on the real test corpus and
  * asserts the partitions are identical, which is what licenses the
  * linear-output form as a drop-in for the quadratic one upstream of
  * dedup_clusters.
  */
class StarEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("star edges yield the same connected components as all-pairs edges") {
    def collectPairs(name: String): Seq[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = collectPairs("dedup_minhash_lsh")
    val star = collectPairs("dedup_minhash_star")
    assert(full.nonEmpty, "test corpus produced no LSH candidate pairs")
    // star thins, never invents: every star edge is bucket-internal, so
    // it must connect vertices the full pair set also connects
    assert(star.size <= full.size)
    assert(components(full) == components(star))
  }
}
