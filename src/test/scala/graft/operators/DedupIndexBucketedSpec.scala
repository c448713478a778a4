package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed dedup-index store: each increment's anti/semi probes must
  * satisfy their distribution requirement straight from the bucketed
  * index files — ZERO Exchange on the index side of any join (the plain
  * parquet layout shuffles the index every batch), only the (tiny)
  * incoming side exchanges. Asserted structurally: no Exchange node's
  * subtree contains an index-table scan. Plus: the batch_id-partition
  * retry discipline carried over from the dir store (pinned reads,
  * idempotent re-accept), and compaction preserving the bucket spec.
  */
class DedupIndexBucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(ids: Range, salt: String) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc $salt $i content word$i tail")).toDF("doc_id", "text")
  }

  private def dropTables(names: String*): Unit = names.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val dir = new java.io.File(wh, t)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  /** Exchanges that move INDEX-table rows: walk each Exchange's child,
    * stopping at join boundaries — dedupAgainst's joins keep `incoming`
    * on the left of anti/semi joins, so any post-join relation is
    * batch-bounded and exchanging it is the expected batch-side
    * shuffle, not an index-side one. Empty result = the index flows
    * from its bucketed files straight into its joins, never through an
    * Exchange. Runs with AQE off so the physical tree is walkable.
    */
  private def indexSideExchanges(df: DataFrame, tables: Set[String]): Seq[SparkPlan] = {
    def scansIndexNoJoin(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(t => tables.contains(t.table))
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
      case other => other.children.exists(scansIndexNoJoin)
    }
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec if scansIndexNoJoin(e.child) => e
    }
  }

  test("zero index-side exchange; parity with plain path; retry + compaction") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // expose the shuffle shape
    s.conf.set("spark.sql.adaptive.enabled", "false")        // walkable physical tree
    try {
      dropTables("dbk_fp", "dbk_bands")
      val batch0 = docs(0 until 40, "a")
      val batch1 = docs(40 until 80, "b")
      DedupIndex.initBucketed(batch0, "dbk_fp", "dbk_bands")
      DedupIndex.acceptBucketed(batch1, "dbk_fp", "dbk_bands", batchId = 1L)
      // incoming: 10 exact dupes of batch0 + 10 fresh docs
      val incoming = docs(0 until 10, "a").union(docs(100 until 110, "c"))

      def bucketed = DedupIndex.dedupBatchBucketed(s, "dbk_fp", "dbk_bands", incoming)
      val existing = batch0.union(batch1)
      val plain = DedupIndex.dedupAgainst(incoming,
        DedupIndex.fingerprints(existing), DedupIndex.bandRows(existing))

      // output parity with the plain (inline) path
      val bOut = bucketed.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      val pOut = plain.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(bOut == pOut, s"bucketed=$bOut plain=$pOut")
      assert(bOut == (100L until 110L), "exact dupes must be rejected, fresh docs kept")

      // THE scale property: no Exchange moves index-table rows
      val bad = indexSideExchanges(bucketed, Set("dbk_fp", "dbk_bands"))
      assert(bad.isEmpty,
        s"index side must never exchange, found:\n${bad.mkString("\n")}")
      // ... and the bucketed plan carries strictly fewer exchanges than
      // the plain path over the same relations (the index-side ones)
      def totalExchanges(df: DataFrame): Int =
        df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
      val plainDf = DedupIndex.dedupAgainst(incoming,
        DedupIndex.fingerprints(existing), DedupIndex.bandRows(existing))
      assert(totalExchanges(bucketed) < totalExchanges(plainDf),
        s"bucketed=${totalExchanges(bucketed)} plain=${totalExchanges(plainDf)}")
      // and the scans really are bucketed
      assert(bucketed.queryExecution.executedPlan.toString.contains("Bucketed: true"))

      // pinned read: batchId=1 sees only batch 0 → batch1's docs look new
      val pinned = DedupIndex.dedupBatchBucketed(s, "dbk_fp", "dbk_bands",
        docs(40 until 45, "b"), batchId = 1L)
      assert(pinned.count() == 5L, "pinned read must not see the batch's own rows")
      val unpinned = DedupIndex.dedupBatchBucketed(s, "dbk_fp", "dbk_bands",
        docs(40 until 45, "b"))
      assert(unpinned.count() == 0L, "unpinned read sees batch 1 rows as dupes")

      // retry idempotency: re-accepting the same batch id cannot double rows
      val before = s.table("dbk_fp").count()
      DedupIndex.acceptBucketed(batch1, "dbk_fp", "dbk_bands", batchId = 1L)
      assert(s.table("dbk_fp").count() == before,
        "re-accept of the same batch id must overwrite its own partition, not append")

      // compaction folds partitions, preserves bucket spec + plan shape
      DedupIndex.compactBucketed(s, "dbk_fp", "dbk_bands")
      val batchIds = s.table("dbk_fp").select(col("batch_id").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(batchIds == Seq(1L), s"fold into high-water id, got $batchIds")
      assert(s.table("dbk_fp").count() == before, "compaction must not lose rows")
      val postCompact = DedupIndex.dedupBatchBucketed(s, "dbk_fp", "dbk_bands", incoming)
      assert(postCompact.select("doc_id").orderBy("doc_id").collect()
        .map(_.getLong(0)).toSeq == bOut, "post-compaction output parity")
      assert(indexSideExchanges(postCompact, Set("dbk_fp", "dbk_bands")).isEmpty,
        "compaction must preserve the bucketed (exchange-free) scan")
      val spec = s.sessionState.catalog
        .getTableMetadata(s.sessionState.sqlParser.parseTableIdentifier("dbk_fp"))
        .bucketSpec
      assert(spec.exists(b => b.numBuckets == 8 && b.bucketColumnNames == Seq("fp")),
        s"bucket spec must survive compaction, got $spec")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      dropTables("dbk_fp", "dbk_bands")
    }
  }

  test("external-location init: data lands at the location, bucket spec kept, " +
    "re-init clears stale external data") {
    // r18 (relay_bucketed_state): external tables put the bucketed
    // store's files where the caller's GC owns them; DROP TABLE leaves
    // external data behind, so init must clear the location itself or
    // a re-init would resurrect stale batches under the fresh catalog
    // entry.
    val s = spark
    val loc = java.nio.file.Files.createTempDirectory("graft-dbk-ext").toString
    try {
      DedupIndex.initBucketed(docs(1 to 6, "x"), "dbk_ext_fp", "dbk_ext_bands",
        location = Some(loc))
      assert(new java.io.File(s"$loc/fp").exists && new java.io.File(s"$loc/bands").exists,
        "external init must land table data at the location")
      val spec = s.sql("DESCRIBE TABLE EXTENDED dbk_ext_fp")
        .collect().map(r => r.getString(0) + ":" + r.getString(1)).mkString("\n")
      assert(spec.contains("Num Buckets") && spec.contains("fp"),
        s"external table must keep the bucket spec, got\n$spec")
      // the scale property must survive external placement: the probe
      // plan reads the index straight from its bucketed files — zero
      // index-side Exchange, same assertion as the managed-table case
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val probe = DedupIndex.dedupBatchBucketed(s, "dbk_ext_fp", "dbk_ext_bands",
          docs(20 to 22, "z"), 1L)
        val bad = indexSideExchanges(probe, Set("dbk_ext_fp", "dbk_ext_bands"))
        assert(bad.isEmpty,
          s"external bucketed tables must not exchange index-side, got ${bad.size}")
      } finally {
        s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        s.conf.unset("spark.sql.adaptive.enabled")
      }
      // accept a batch, then RE-INIT from a smaller corpus: the old
      // batch-1 partition must be gone from both catalog and disk
      DedupIndex.acceptBucketed(
        DedupIndex.dedupBatchBucketed(s, "dbk_ext_fp", "dbk_ext_bands",
          docs(10 to 12, "y"), 1L),
        "dbk_ext_fp", "dbk_ext_bands", 1L)
      assert(s.table("dbk_ext_fp").filter(col("batch_id") === 1L).count() === 3L)
      DedupIndex.initBucketed(docs(1 to 2, "x"), "dbk_ext_fp", "dbk_ext_bands",
        location = Some(loc))
      assert(s.table("dbk_ext_fp").count() === 2L,
        "re-init must not resurrect stale external batch partitions")
      assert(s.table("dbk_ext_fp").filter(col("batch_id") === 1L).count() === 0L)
    } finally {
      dropTables("dbk_ext_fp", "dbk_ext_bands")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(loc))
    }
  }

  test("recoverBucketedSwap heals both compaction crash windows") {
    val s = spark
    try {
      dropTables("hbk_fp", "hbk_bands", "hbk_fp_compact_swap")
      DedupIndex.initBucketed(docs(0 until 20, "a"), "hbk_fp", "hbk_bands")
      DedupIndex.acceptBucketed(docs(20 until 40, "b"), "hbk_fp", "hbk_bands", batchId = 1L)
      val expect = s.table("hbk_fp").count()

      // window 1: crash between DROP live and RENAME staging — live
      // table gone, pending-marked staging present
      s.table("hbk_fp").write.mode("overwrite")
        .partitionBy("batch_id").bucketBy(8, "fp").sortBy("fp")
        .format("parquet").saveAsTable("hbk_fp_compact_swap")
      s.sql("ALTER TABLE hbk_fp_compact_swap SET TBLPROPERTIES " +
        "('graft.compact.swap.pending' = 'true')")
      s.sql("DROP TABLE hbk_fp")
      DedupIndex.recoverBucketedSwap(s, "hbk_fp")
      assert(s.table("hbk_fp").count() == expect,
        "heal must promote the pending staging table")
      assert(!s.sessionState.catalog.getTableMetadata(
        s.sessionState.sqlParser.parseTableIdentifier("hbk_fp"))
        .properties.contains("graft.compact.swap.pending"),
        "heal must clear the pending marker")

      // window 2: crash between RENAME and the partition repair — live
      // table present but still marked pending; heal must re-repair
      // and unmark, and be a no-op on the data
      s.sql("ALTER TABLE hbk_fp SET TBLPROPERTIES " +
        "('graft.compact.swap.pending' = 'true')")
      DedupIndex.recoverBucketedSwap(s, "hbk_fp")
      assert(s.table("hbk_fp").count() == expect)
      assert(!s.sessionState.catalog.getTableMetadata(
        s.sessionState.sqlParser.parseTableIdentifier("hbk_fp"))
        .properties.contains("graft.compact.swap.pending"))

      // and a healthy table passes through untouched
      DedupIndex.recoverBucketedSwap(s, "hbk_fp")
      assert(s.table("hbk_fp").count() == expect)
    } finally dropTables("hbk_fp", "hbk_bands", "hbk_fp_compact_swap")
  }

  test("promotion: dir store -> bucketed layout keeps batch history and sheds the exchange") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-promote").toString
    try {
      dropTables("pbk_fp", "pbk_bands")
      DedupIndex.init(docs(0 until 30, "a"), dir)
      DedupIndex.accept(docs(30 until 60, "b"), dir, 1L)
      DedupIndex.accept(docs(60 until 90, "c"), dir, 2L)
      DedupIndex.promoteBucketed(s, dir, "pbk_fp", "pbk_bands")

      // promoted table == dir table, batch history carried verbatim
      assert(s.table("pbk_fp").select(col("batch_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
      val incoming = docs(30 until 35, "b").union(docs(200 until 205, "z"))
      val viaDir = DedupIndex.dedupBatch(s, dir, incoming)
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      val viaTables = DedupIndex.dedupBatchBucketed(s, "pbk_fp", "pbk_bands", incoming)
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(viaTables == viaDir && viaTables == (200L until 205L),
        s"promoted store must reproduce the dir store: dir=$viaDir tables=$viaTables")

      // the pinned-read replay contract survives the layout switch
      val pinnedDir = DedupIndex.dedupBatch(s, dir, docs(60 until 65, "c"), batchId = 2L)
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      val pinnedTables = DedupIndex
        .dedupBatchBucketed(s, "pbk_fp", "pbk_bands", docs(60 until 65, "c"), batchId = 2L)
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(pinnedTables == pinnedDir && pinnedTables.size == 5,
        "pinned read must not see the batch's own rows after promotion")

      // and the whole point: the promoted layout runs exchange-free
      val bad = indexSideExchanges(
        DedupIndex.dedupBatchBucketed(s, "pbk_fp", "pbk_bands", incoming),
        Set("pbk_fp", "pbk_bands"))
      assert(bad.isEmpty, s"promoted index must not exchange:\n${bad.mkString("\n")}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      dropTables("pbk_fp", "pbk_bands")
    }
  }
}
