package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational / metadata operators from SURVEY.md §2: ingest filters
  * (F1-F6), lookup joins (J1-J3), RLS semi-join (F8/J2), backfill
  * anti-join (S2/F4), status aggregations (A1/A4), sorts (V6), set ops
  * (§2.8) and sessionization over the event stream (T1-T2 in batch form).
  *
  * Scale notes: dimension sides of joins are explicitly `broadcast`; all
  * aggregations are partial-agg friendly (plain groupBy over scalar
  * exprs); final `orderBy` exists only for oracle determinism and is
  * eliminated by Catalyst under count-only benchmarks.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The (old, new) snapshot pair the CDC queries derive in-query
    * (deterministic deletes via %97, updates via %13, inserts under
    * NEGATED keys — synthetic ids must never alias real ones; see the
    * snapshot_diff comment for the -(key+1) rationale).
    */
  private def snapshotPair(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val old = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val nw = old
      .filter(col("o_orderkey") % 97 =!= 0) // deletes
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + lit(1.5))
          .otherwise(col("o_totalprice"))) // updates
      .unionByName(
        old.filter(col("o_orderkey") % 101 === 0)
          // -(key+1): o_orderkey starts at 0, and -0 == 0 would alias
          // the real key (key 0 is deleted by %97 AND re-added as -0,
          // silently cancelling both out of the diff)
          .select((-(col("o_orderkey") + 1)).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus"))) // inserts
    (old, nw)
  }

  /** Key-level diff of two snapshots: (key, added|removed|changed,
    * old_price, new_price), unchanged rows dropped. ONE full-outer
    * sort-merge join keyed on o_orderkey; no window, no second scan.
    */
  private[operators] def snapshotDiffOf(old: DataFrame, nw: DataFrame): DataFrame =
    old.as("o").join(nw.as("n"), col("o.o_orderkey") === col("n.o_orderkey"), "full_outer")
      .select(
        coalesce(col("o.o_orderkey"), col("n.o_orderkey")).as("o_orderkey"),
        when(col("o.o_orderkey").isNull, "added")
          .when(col("n.o_orderkey").isNull, "removed")
          .otherwise("changed").as("status"),
        round(col("o.o_totalprice"), 6).as("old_price"),
        round(col("n.o_totalprice"), 6).as("new_price"))
      // null-SAFE inequality (review finding r14): with `=!=`, a row
      // whose price went NULL→42 (or 42→NULL) evaluated to NULL and was
      // FILTERED OUT of the diff, breaking the applyDiff round-trip law
      // for any nullable tracked column (latent here — corpus prices
      // are non-null — but the CDC primitive must not depend on that)
      .filter(col("status") =!= "changed" ||
        !(col("old_price") <=> col("new_price")))

  /** CDC apply — upsert/delete a diff feed into a base snapshot (the
    * Delta MERGE shape; reference has no consumer for its diff exports,
    * this completes the pair). ONE full-outer join on `key` routes all
    * three cases: `removed` drops the row, `changed`/`added` take the
    * diff's new value (added rows carry NULL for base columns the diff
    * doesn't cover — callers project accordingly), absent-from-diff
    * keeps the base row untouched. `setCols` maps each base column to
    * the diff column holding its new value. Law (pinned by
    * SnapshotApplySpec and the snapshot_apply oracle):
    * applyDiff(old, snapshotDiff(old, new)) == new.
    */
  def applyDiff(base: DataFrame, diff: DataFrame, key: String,
                setCols: Map[String, String]): DataFrame = {
    val d = diff.select((key +: "status" +: setCols.values.toSeq).map(col): _*)
    val valueCols: Seq[Column] = base.columns.filter(_ != key).toSeq.map { c =>
      setCols.get(c) match {
        case Some(nc) =>
          when(col("status").isin("changed", "added"), col(nc)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    base.join(d, Seq(key), "full_outer")
      .filter(col("status").isNull || col("status") =!= "removed")
      .select(col(key) +: valueCols: _*)
  }

  /** Audit tolerance for the HLL sketch vs the exact distinct count:
    * |approx − exact| ≤ max(5, 10% of exact). Spark's HLL++ carries no
    * sparse-exact mode, so tiny cardinalities run the linear-counting
    * regime and land 1–3 BELOW exact (measured across all window×type
    * groups at every SF: worst abs dev 3 at n=30, worst rel dev 25% at
    * n=4); pure-relative 5% is stricter than the estimator's actual
    * small-range contract and flaked on n=4 groups. The combined bound
    * still gates the real property — rsd 0.02 keeps large groups
    * within a few percent — while honoring the small-range regime.
    */
  private def hllWithinTolerance(approx: Column, exact: Column): Column =
    abs(approx - exact).cast("double") <=
      greatest(lit(5.0), exact.cast("double") * 0.1)

  val queries: Map[String, Q] = Map(
    // F2: size gate (drive_file_handler.py:53-61) on documents.n_chars.
    "f2_size_filter" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("n_chars") <= 300)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),
    // F1: supported-type filter (text_extraction.py:43-61), lang as the type.
    "f1_type_filter" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(lower(col("lang")).isin("en", "de", "fr"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    // F3: folder filter (drive_file_handler.py:33-35 — skip is_group
    // rows). The corpus has no folder rows, so the Drive listing is
    // modeled faithfully: one synthetic folder row per distinct source
    // (the containing "folder") unioned with the file rows, then the
    // filter drops is_group — Catalyst prunes the folder branch
    // entirely, which is exactly what the handler's early-return does.
    "f3_folder_filter" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val files = docs.select(col("doc_id"), col("source"), lit(false).as("is_group"))
      val folders = docs.select(col("source")).distinct()
        .select(lit(null).cast("long").as("doc_id"), col("source"), lit(true).as("is_group"))
      files.unionByName(folders)
        .filter(!col("is_group"))
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),
    // F5: retryable-job filter (process_embedding.py:523-530).
    "f5_retry_filter" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "error" && col("value") < 3)
        .select(col("event_id"), col("user_id"), round(col("value"), 6).as("retry_value"))
        .orderBy("event_id")
    }),
    // F6: TTL filter (process_embedding.py:552-563) on completed orders.
    "f6_ttl_filter" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"))
        .orderBy("o_orderkey")
    }),
    // S2/F4/J3: backfill anti-join — files with no live job
    // (data_pipeline_settings.py:166-180). Customers with no open order.
    "j3_backfill_anti" -> ((s, d) => {
      val jobs = Tables.orders(s, d).filter(col("o_orderstatus").isin("O", "P"))
      Tables.customer(s, d)
        .join(jobs, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    // F8/J2: RLS semi-join over owned ∪ shared (permissions.py:66-77).
    "j2_rls_semijoin" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val owned = cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val shared = cust.filter(col("c_acctbal") > 8000).select(col("c_custkey"))
      Tables.orders(s, d)
        .join(owned.union(shared).distinct(), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    // F7: RLS admin bypass (permissions.py:19-21, 53-55) — an
    // Administrator / System Manager caller gets the UNFILTERED relation
    // through the same role dispatch the non-admin semi-join path uses
    // (graft.search.SearchService.rlsFilter); the semi-join is absent
    // from the plan, not merely vacuous.
    "j2_rls_admin" -> ((s, d) => {
      val owned = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      graft.search.SearchService.rlsFilter(
          Tables.orders(s, d), owned, idCol = "o_custkey", roles = Seq("System Manager"))
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    // J1/J5: chunk→file metadata enrichment via broadcast lookup join
    // (process_embedding.py:379-384).
    "j1_enrich_broadcast" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      // NO forced broadcast hint (review finding r14): orders is a
      // FACT parent growing with the corpus (1:4 to lineitem), not a
      // bounded dimension — a forced broadcast OOMs at the 100 TB
      // regime. AQE broadcasts it while it fits (PlanShapeSpec pins
      // the BroadcastHashJoin at test scale) and degrades to a shuffle
      // join when it no longer does, which is the honest scale shape.
      Tables.lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // A1: processing stats by status (data_pipeline_settings.py:224-236).
    "a1_status_stats" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    // A1 single-pass variant: all counters in one scan.
    "a1_single_pass" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.agg(
        count(lit(1)).as("total"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"))
    }),
    // A4: per-user progress accounting (process_embedding.py:364-367).
    "a4_progress" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("total_events"),
          count(when(col("event_type") === "purchase", 1)).as("purchases"))
        .withColumn("progress_pct",
          round(col("purchases") * 100.0 / col("total_events"), 2))
        .orderBy("user_id")
    }),
    // V6: list-view default sort, newest first (document_chunk.json:212).
    "v6_sort_limit" -> ((s, d) => {
      Tables.events(s, d)
        .orderBy(col("ts").desc, col("event_id"))
        .limit(100)
        .select(col("event_id"), col("ts"))
    }),
    // §2.8: UNION of owned and shared principals (permissions.py:69-76).
    "setop_union" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        .union(cust.filter(col("c_acctbal") > 8000).select(col("c_custkey")))
        .distinct()
        .orderBy("c_custkey")
    }),
    // Multi-hop dimension joins + grouped aggregation (region→nation→cust→orders).
    "multihop_revenue" -> ((s, d) => {
      Tables.region(s, d)
        .join(broadcast(Tables.nation(s, d)), col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    }),
    // Star-schema profit rollup (fact + three broadcast dimensions —
    // the classic warehouse join shape): revenue by supplier nation and
    // part brand. Money is aggregated as exact integer CENTS (per-row
    // floor(x·100 + 0.5) then a long sum) — at scale a float sum's
    // result depends on partition merge order, so currency must leave
    // the float domain BEFORE the cross-row aggregate.
    "star_profit" -> ((s, d) => {
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
        .cast("long")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("p_brand"), cents.as("cents"))
        .groupBy(col("n_name"), col("p_brand"))
        .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n_lines"))
        .orderBy("n_name", "p_brand")
    }),
    // §2.8 completions: intersect / except (reference only has UNION;
    // these round out the set-op surface).
    "setop_intersect" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        .intersect(cust.filter(col("c_acctbal") > 8000).select(col("c_custkey")))
        .orderBy("c_custkey")
    }),
    "setop_except" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        .except(cust.filter(col("c_acctbal") > 8000).select(col("c_custkey")))
        .orderBy("c_custkey")
    }),
    // As-of join (the canonical "operator Spark lacks" composed from
    // built-ins): each purchase picks the most recent prior view of the
    // same user via tagged-union + last(ignoreNulls) running window —
    // one shuffle on user_id, sort within partition; no range blow-up.
    "asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val views = e.filter(col("event_type") === "view").select(
        col("user_id"), col("ts"), lit(0).as("kr"),
        lit(null).cast("long").as("event_id"),
        col("event_id").as("v_id"), col("value").as("v_val"))
      val purchases = e.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), lit(1).as("kr"),
        col("event_id"),
        lit(null).cast("long").as("v_id"), lit(null).cast("double").as("v_val"))
      // event-id tiebreak (review finding r14): two views for one user
      // at the SAME ts made last(v_id) shuffle-order-dependent — latent
      // (the corpus has no per-user ts ties) but the determinism
      // discipline sessionize already follows
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kr"), coalesce(col("v_id"), col("event_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(purchases)
        .withColumn("asof_view_id", last(col("v_id"), ignoreNulls = true).over(w))
        .withColumn("asof_view_value",
          round(last(col("v_val"), ignoreNulls = true).over(w), 6))
        .filter(col("kr") === 1)
        .select(col("event_id"), col("user_id"), col("asof_view_id"), col("asof_view_value"))
        .orderBy("event_id")
    }),
    // Snapshot diff (the CDC primitive): added / removed / changed rows
    // between two table versions, via ONE full-outer join on the key
    // with column comparison inside — the pattern a 100 TB pipeline
    // uses to audit a reload or derive an incremental feed without
    // keeping per-row history. The "new" snapshot is derived in-query
    // (deterministic deletes via %97, updates via %13, inserts under
    // NEGATED keys — synthetic ids must never alias real ones). Plan:
    // one sort-merge join keyed on o_orderkey; no window, no second
    // scan of either side.
    "snapshot_diff" -> ((s, d) =>
      snapshotDiffOf(snapshotPair(s, d)._1, snapshotPair(s, d)._2)
        .orderBy("o_orderkey")),
    // CDC APPLY — the consumer of the snapshot_diff feed (VERDICT r11
    // #5: the pair was one-directional). applyDiff is the Delta-MERGE
    // shape: ONE full-outer keyed join routes removed/changed/added in
    // a single pass. The round-trip law applyDiff(old,
    // snapshot_diff(old, new)) == new IS this query's oracle: Spark
    // reconstructs `new` from old+diff while DuckDB derives `new`
    // directly — a hash match proves the reconstruction exact.
    "snapshot_apply" -> ((s, d) => {
      val (old, _) = snapshotPair(s, d)
      val diff = queries("snapshot_diff")(s, d)
      applyDiff(old.select(col("o_orderkey"), col("o_totalprice")), diff,
        "o_orderkey", Map("o_totalprice" -> "new_price"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 6).as("price"))
        .orderBy("o_orderkey")
    }),
    // SCD Type-2 point-in-time join: enrich each event with the
    // dimension VERSION valid at event time — the warehouse pattern for
    // versioned reference data (customer tier history, model configs).
    // The versioned dimension is derived in-query (the derived-corpus
    // oracle discipline): each user's event-time span splits into 3
    // tiers with integer-micros boundaries, exact in both engines.
    // Plan shape at scale: one agg shuffle builds the dim, then the
    // point-in-time lookup is an EQUI join on user_id with the validity
    // range as an in-bucket filter — never a theta join; the range
    // never touches the join key, so there is no interval blow-up. The
    // version count per key is bounded (3), so the join fan-out is
    // bounded before the range filter prunes it to exactly one row.
    "scd2_join" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val dim = e.groupBy("user_id")
        .agg(min(col("us")).as("mn"), (max(col("us")) - min(col("us")) + 1).as("len"))
        .select(col("user_id"), col("mn"), col("len"),
          explode(sequence(lit(0L), lit(2L))).as("tier"))
        .select(col("user_id"), col("tier"),
          expr("mn + (len * tier) DIV 3").as("valid_from"),
          expr("mn + (len * (tier + 1)) DIV 3").as("valid_to"))
      e.join(dim, Seq("user_id"))
        .filter(col("us") >= col("valid_from") && col("us") < col("valid_to"))
        .select(col("event_id"), col("user_id"), col("tier"), col("valid_from"))
        .orderBy("event_id")
    }),
    // Range join, bucketized: events within 1 hour after each purchase.
    // Naive theta-join is O(n²); bucketing ts to the hour means each
    // probe only joins its own and the next bucket (equi-join on
    // (user, bucket)), then the exact range predicate filters inside the
    // bucket — the standard interval-join decomposition at scale.
    "range_join_1h" -> ((s, d) => {
      val HourUs = 3600000000L
      val e = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("e_us"))
        .withColumn("eb", floor(col("e_us") / HourUs))
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
        .withColumn("pb", floor(col("p_us") / HourUs))
      val candidates = p
        .select(col("event_id"), col("user_id"), col("p_us"),
          explode(array(col("pb"), col("pb") + 1)).as("eb"))
      val matched = candidates
        .join(e, Seq("user_id", "eb"))
        .filter(col("e_us") > col("p_us") && col("e_us") <= col("p_us") + HourUs)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_follow"))
      p.select(col("event_id"))
        .join(matched, Seq("event_id"), "left")
        .select(col("event_id"), coalesce(col("n_follow"), lit(0L)).as("n_follow"))
        .orderBy("event_id")
    }),
    // Scale pattern: two-stage salted aggregation — the skew-mitigation
    // shape for hot keys at 100 TB (salt → partial agg per (key,salt) →
    // final agg per key). Result is provably identical to the direct
    // groupBy, which is exactly what the oracle checks.
    "skew_salted_agg" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("partial_n"))
        .groupBy(col("event_type"))
        .agg(sum(col("partial_n")).as("n"))
        .orderBy("event_type")
    }),
    // Exact distinct cardinality per group (the dedup-accounting agg).
    "count_distinct_users" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),
    // Sketch path for distinct cardinality — at 100 TB exact
    // count-distinct shuffles every distinct key; HyperLogLog++ is a
    // constant-memory partial aggregate (register-max merge, order-
    // insensitive, so the result is deterministic under any partition
    // schedule). The oracle gates a PROPERTY, not the sketch value:
    // the exact count (hash-exact cross-engine) plus the sketch
    // landing inside hllWithinTolerance's |approx−exact| ≤ max(5, 10%)
    // band (see its doc block for why pure-relative 5% flaked at tiny
    // cardinalities; DuckDB asserts the same literal) — an honest
    // gate for an operator whose
    // value is approximate by design. The plan's (event_type, user_id)
    // distinct expansion comes from the EXACT side of the audit; a
    // production approx-only query is a single partial-HLL aggregate
    // with no distinct shuffle at all, which is the whole point.
    "approx_distinct_audit" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
        .select(col("event_type"), col("n_exact"),
          hllWithinTolerance(col("n_approx"), col("n_exact")).as("approx_ok"))
        .orderBy("event_type")
    }),
    // Sketch path for quantiles — same shape: exact interpolated
    // percentiles (oracled exactly against quantile_cont) plus the
    // approx_percentile sketch within 5% relative tolerance. The
    // sketch VALUE never reaches the output (quantile-summary merge
    // order could jitter the last ulp; the tolerance verdict cannot).
    "approx_quantile_audit" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("e50"),
          expr("percentile(value, 0.95)").as("e95"),
          expr("approx_percentile(value, 0.5, 10000)").as("a50"),
          expr("approx_percentile(value, 0.95, 10000)").as("a95"))
        .select(col("event_type"),
          round(col("e50"), 6).as("p50_exact"),
          round(col("e95"), 6).as("p95_exact"),
          ((abs(col("a50") - col("e50")) / (abs(col("e50")) + 1.0) < 0.05) &&
            (abs(col("a95") - col("e95")) / (abs(col("e95")) + 1.0) < 0.05)).as("approx_ok"))
        .orderBy("event_type")
    }),
    // Interpolated quantiles per group (p50/p95 over event values).
    "quantiles_value" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"))
        .orderBy("event_type")
    }),
    // Extension: hierarchical rollup totals (region → nation → grand) —
    // partial-agg friendly; subtotal rows carry NULL group keys.
    "rollup_revenue" -> ((s, d) => {
      Tables.region(s, d)
        .join(broadcast(Tables.nation(s, d)), col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),
    // Window top-N per group (two-phase top-k analog of V3/V4).
    "window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
        .orderBy("o_custkey", "rnk")
    }),
    // A2: mean over a group (OCR confidence analog — ocr_service.py:150).
    "a2_avg_value" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(round(avg(col("value")), 6).as("avg_value"))
        .orderBy("event_type")
    }),
    // A3: bounded-sample average (≤5-page PDF sampling analog,
    // decision_agent.py:190-211): per source, avg n_chars of the 5
    // lowest-doc_id docs.
    "a3_sample_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy(col("source"))
        .agg(round(avg(col("n_chars")), 6).as("avg_chars"), count(lit(1)).as("n_sampled"))
        .orderBy("source")
    }),
    // Streaming-form batch equivalent: tumbling 1-hour event-time windows
    // (the windowed agg the Structured Streaming job runs — see
    // graft.streaming; epoch-aligned in both engines).
    "t1_window_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    }),
    // T1 sketch form: windowed distinct users via HLL — the continuous
    // analytics shape at 100 TB, where per-window exact distinct keeps
    // an unbounded user set in state and the sketch keeps a constant
    // few KB per (window, type). Same audit-style oracle as
    // approx_distinct_audit (exact hash-exact + the hllWithinTolerance
    // max(5, 10%) band); the
    // streaming twin (EventStreams.windowedDistinctUsers) is proven
    // batch/stream bit-identical in EventStreamsSpec — HLL registers
    // merge by max, so any partial/merge order yields the same result.
    "t1_window_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id"), 0.02).as("na"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n_users"),
          hllWithinTolerance(col("na"), col("n_users")).as("approx_ok"))
        .orderBy("w_start", "event_type")
    }),
    // Native session windows (gap-merged event-time sessions) — the
    // batch form of Structured Streaming's session_window; same gap rule
    // as `sessionize`, but fused into one aggregation. Boundary note:
    // session_window merges an event landing EXACTLY at the previous
    // session's end (inclusive; measured in EventStreamsSpec), while the
    // oracle's >= condition splits there — equivalent on this corpus
    // because microsecond timestamps never tie the boundary exactly.
    "session_window_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }),
    // T1/T2 batch form: sessionize events per user (30-minute gap rule).
    "sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val prevTs = lag(col("ts"), 1).over(byUser)
      Tables.events(s, d)
        .withColumn("is_new",
          when(prevTs.isNull ||
            unix_micros(col("ts")) - unix_micros(prevTs) > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("event_id"), col("session_id"))
        .orderBy("user_id", "event_id")
    }),
    // Hot-key guard accounting END TO END (VERDICT r14 ask #3; the
    // reference analogue is the job ledger's error-accounting surface,
    // tasks/process_embedding.py:69-81): events driven through the REAL
    // capped sessionize operator so over-cap keys overflow the guard
    // heap, their drops travel the accumulator channel, land via the
    // production flushHotKeyDrops sink, and read back as the (op,
    // user_id, dropped_events) relation. Cap 50 sits below this
    // corpus's busiest users at every SF (per-user counts run ~40-90),
    // so the relation is non-trivially populated; in batch mode each
    // key's slice reaches one group invocation, making the relation
    // exactly {(key, n−cap) | n > cap} — which is what DuckDB replays.
    "hot_key_drops" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
        .as[graft.streaming.EventStreams.EventIn]
      // applicationId in the path (ADVICE r15): two JVMs on the same
      // corpus (bench + verify) raced on one fixed dir, each wiping the
      // other's in-flight audit output. TmpDirs adds the shutdown-hook
      // + hour-stale-foreign GC (ADVICE r16: the salted dirs leaked).
      val dir = TmpDirs.salted(s, "hotkey", d)
      graft.streaming.EventStreams.hotKeyAudit(ev, cap = 50, dir)
        .orderBy("user_id")
    }),
    // Ordered funnel per user: first view → first click AFTER it →
    // first purchase after that (the classic product-analytics
    // sequence-match; ClickHouse windowFunnel / Amplitude funnels).
    // Each step is a user-keyed conditional-min aggregate over events
    // joined to the previous step's frontier — three aggs that all
    // shuffle on user_id, so AQE reuses one exchange; no per-user sort,
    // no window over the raw event stream. All-integer micros, so the
    // step times and depth are hash-exact cross-engine.
    "funnel_steps" -> ((s, d) => {
      funnelSteps(Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")))
    }),
    // The PARAMETERIZED funnel on a different step list (signup →
    // view → click → purchase) — proof the operator is the ClickHouse
    // windowFunnel shape, not a 3-step fixture: same conditional-min
    // frontier chain, one more fold step, hash-gated end to end.
    "funnel_steps_4" -> ((s, d) => {
      funnelSteps(Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")),
        steps = Seq("signup", "view", "click", "purchase"))
    }),
    // ClickHouse windowFunnel at a LIVE 2-day window (median
    // first-view -> purchase span on this corpus is ~4 days, so the
    // window genuinely prunes chains and the max-over-anchors
    // semantics genuinely differs from the anchored funnel above).
    "window_funnel" -> ((s, d) => {
      windowFunnel(Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")))
    }),
    // Cohort retention over the event stream (the other classic
    // product-analytics table beside the funnel): users grouped by the
    // week of their FIRST event, then counted in every later week they
    // were active. Two user-keyed aggregates (first-event, distinct
    // active weeks) and a broadcast-joinable |users|-row frontier — no
    // per-user sort, no window. Week ids are INTEGER division of
    // epoch-micros (div, not floor-of-double-division: exact at any
    // timestamp magnitude), so the whole table is hash-exact.
    "retention_cohorts" -> ((s, d) => {
      val WeekUs = 604800000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val first = ev.groupBy(col("user_id")).agg(min(col("us")).as("f_us"))
        .select(col("user_id"), expr(s"f_us div $WeekUs").as("cohort_week"))
      val active = ev.select(col("user_id"), expr(s"us div $WeekUs").as("week")).distinct()
      active.join(first, Seq("user_id"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    })
  )

  /** Ordered-funnel body over any (user_id, event_type, us) relation —
    * see the `funnel_steps` query comment. Parameterized by the step
    * list (the ClickHouse windowFunnel shape — the operator, not a
    * fixture): each step's frontier is the user-keyed conditional min
    * of its events strictly after the previous frontier, folded left
    * along `steps`; all frontiers shuffle on user_id so AQE reuses one
    * exchange regardless of step count. Output: `t_<step>` per step
    * (NULL once the chain breaks) + `funnel_depth`. FunnelSpec drives
    * crafted out-of-order sequences and a 4-step list through it.
    */
  def funnelSteps(ev: DataFrame,
                  steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnelSteps: steps must be non-empty and distinct, got $steps")
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("us")).as(s"t_${steps.head}"))
    val frontiers = steps.tail.foldLeft(Vector(first)) { (acc, st) =>
      val prev = s"t_${steps(acc.length - 1)}"
      acc :+ ev.filter(col("event_type") === st)
        .join(acc.last, Seq("user_id"))
        .filter(col("us") > col(prev))
        .groupBy(col("user_id")).agg(min(col("us")).as(s"t_$st"))
    }
    val joined = frontiers.tail.foldLeft(frontiers.head)(_.join(_, Seq("user_id"), "left"))
    val depth = steps.tail.foldLeft(lit(1)) { (d, st) =>
      d + when(col(s"t_$st").isNotNull, 1).otherwise(0)
    }
    joined
      .select(col("user_id") +: steps.map(st => col(s"t_$st")) :+ depth.as("funnel_depth"): _*)
      .orderBy("user_id")
  }

  /** ClickHouse-semantics windowFunnel: the deepest strictly-ordered
    * step chain per user whose events ALL land within `windowMicros`
    * of the chain's own FIRST event — unlike [[funnelSteps]], which
    * anchors once at the user's first step-1 event, every step-1 event
    * is a candidate anchor and the user's level is the max over
    * anchors (a later anchor can reach deeper when the first one's
    * window expires — FunnelSpec pins exactly that case).
    *
    * Per anchor the greedy earliest-qualifying choice at each level is
    * optimal: taking the min eligible timestamp maximizes the
    * remaining window for every later step, so it dominates any other
    * chain from the same anchor. Shape at scale: one type-filtered
    * pushdown scan per step, each level a user-keyed join + (user,
    * anchor)-keyed conditional-min agg — all shuffles on user_id (AQE
    * reuses the exchange), candidate volume bounded by each user's own
    * step-event × anchor counts, no window function over the raw
    * stream, no per-user sort.
    */
  def windowFunnel(ev: DataFrame,
                   steps: Seq[String] = Seq("view", "click", "purchase"),
                   windowMicros: Long = 2L * 86400L * 1000000L): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"windowFunnel: steps must be non-empty and distinct, got $steps")
    val anchors = ev.filter(col("event_type") === steps.head)
      .select(col("user_id"), col("us").as("t0"), col("us").as("tp"))
    val chain = steps.tail.scanLeft(anchors) { (acc, st) =>
      ev.filter(col("event_type") === st)
        .join(acc, Seq("user_id"))
        .filter(col("us") > col("tp") && col("us") <= col("t0") + windowMicros)
        .groupBy(col("user_id"), col("t0"))
        .agg(min(col("us")).as("tp"))
    }
    chain.zipWithIndex
      .map { case (df, i) => df.select(col("user_id"), lit(i + 1).as("lvl")) }
      .reduce(_ unionByName _)
      .groupBy(col("user_id")).agg(max(col("lvl")).as("funnel_level"))
      .orderBy("user_id")
  }

  val oracles: Map[String, String] = Map(
    "f2_size_filter" ->
      "SELECT doc_id, source, n_chars FROM documents WHERE n_chars <= 300 ORDER BY doc_id",
    "f1_type_filter" ->
      "SELECT doc_id, lang FROM documents WHERE lower(lang) IN ('en','de','fr') ORDER BY doc_id",
    "f3_folder_filter" ->
      ("SELECT doc_id, source FROM (" +
        "SELECT doc_id, source, false AS is_group FROM documents " +
        "UNION ALL SELECT CAST(NULL AS BIGINT), source, true FROM (SELECT DISTINCT source FROM documents)) " +
        "WHERE NOT is_group ORDER BY doc_id"),
    "f5_retry_filter" ->
      ("SELECT event_id, user_id, round(value, 6) AS retry_value FROM events " +
        "WHERE event_type = 'error' AND value < 3 ORDER BY event_id"),
    "f6_ttl_filter" ->
      ("SELECT o_orderkey, o_orderdate FROM orders " +
        "WHERE o_orderstatus = 'F' AND o_orderdate < TIMESTAMP '1997-01-01' ORDER BY o_orderkey"),
    "j3_backfill_anti" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus IN ('O','P')) " +
        "ORDER BY c_custkey"),
    "j2_rls_semijoin" ->
      ("SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice FROM orders " +
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "UNION SELECT c_custkey FROM customer WHERE c_acctbal > 8000) ORDER BY o_orderkey"),
    "j2_rls_admin" ->
      ("SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice FROM orders " +
        "ORDER BY o_orderkey"),
    "j1_enrich_broadcast" ->
      ("SELECT l_orderkey, l_linenumber, o_orderdate, o_orderpriority FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey ORDER BY l_orderkey, l_linenumber"),
    "a1_status_stats" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "a1_single_pass" ->
      ("SELECT count(*) AS total, " +
        "count(CASE WHEN event_type='view' THEN 1 END) AS n_view, " +
        "count(CASE WHEN event_type='click' THEN 1 END) AS n_click, " +
        "count(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchase, " +
        "count(CASE WHEN event_type='error' THEN 1 END) AS n_error, " +
        "count(CASE WHEN event_type='signup' THEN 1 END) AS n_signup FROM events"),
    "a4_progress" ->
      ("SELECT user_id, count(*) AS total_events, " +
        "count(CASE WHEN event_type='purchase' THEN 1 END) AS purchases, " +
        "round(count(CASE WHEN event_type='purchase' THEN 1 END) * 100.0 / count(*), 2) AS progress_pct " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "v6_sort_limit" ->
      "SELECT event_id, ts FROM events ORDER BY ts DESC, event_id LIMIT 100",
    "setop_union" ->
      ("SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "UNION SELECT c_custkey FROM customer WHERE c_acctbal > 8000 ORDER BY c_custkey"),
    "multihop_revenue" ->
      ("SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue " +
        "FROM region JOIN nation ON r_regionkey = n_regionkey " +
        "JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
    "star_profit" ->
      ("WITH c AS (SELECT n_name, p_brand, " +
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey) " +
        "SELECT n_name, p_brand, CAST(sum(cents) AS BIGINT) AS revenue_cents, " +
        "count(*) AS n_lines FROM c GROUP BY 1, 2 ORDER BY n_name, p_brand"),
    "setop_intersect" ->
      ("SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 8000 ORDER BY c_custkey"),
    "setop_except" ->
      ("SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 8000 ORDER BY c_custkey"),
    "asof_join" ->
      ("SELECT p.event_id, p.user_id, v.event_id AS asof_view_id, " +
        "round(v.value, 6) AS asof_view_value " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id AND p.ts >= v.ts ORDER BY p.event_id"),
    "snapshot_diff" ->
      ("WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders), " +
        "nw AS (SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.5 ELSE o_totalprice END AS o_totalprice, " +
        "o_orderstatus FROM old WHERE o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT -(o_orderkey + 1), o_totalprice, o_orderstatus FROM old WHERE o_orderkey % 101 = 0) " +
        "SELECT * FROM (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey, " +
        "CASE WHEN o.o_orderkey IS NULL THEN 'added' " +
        "WHEN n.o_orderkey IS NULL THEN 'removed' ELSE 'changed' END AS status, " +
        "round(o.o_totalprice, 6) AS old_price, round(n.o_totalprice, 6) AS new_price " +
        "FROM old o FULL OUTER JOIN nw n ON o.o_orderkey = n.o_orderkey) " +
        "WHERE status <> 'changed' OR old_price IS DISTINCT FROM new_price ORDER BY o_orderkey"),
    // round-trip pin: Spark reconstructs `new` by APPLYING the diff to
    // `old`; the oracle derives `new` directly — a hash match proves
    // applyDiff(old, snapshot_diff(old, new)) == new
    "snapshot_apply" ->
      ("WITH old AS (SELECT o_orderkey, o_totalprice FROM orders), " +
        "nw AS (SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.5 ELSE o_totalprice END AS o_totalprice " +
        "FROM old WHERE o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT -(o_orderkey + 1), o_totalprice FROM old WHERE o_orderkey % 101 = 0) " +
        "SELECT o_orderkey, round(o_totalprice, 6) AS price FROM nw ORDER BY o_orderkey"),
    "scd2_join" ->
      ("WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events), " +
        "b AS (SELECT user_id, min(us) AS mn, max(us) - min(us) + 1 AS len FROM e GROUP BY user_id), " +
        "dim AS (SELECT user_id, v.tier, mn + (len * v.tier) // 3 AS valid_from, " +
        "mn + (len * (v.tier + 1)) // 3 AS valid_to " +
        "FROM b, (SELECT unnest(range(0, 3)) AS tier) v) " +
        "SELECT e.event_id, e.user_id, d.tier, d.valid_from " +
        "FROM e JOIN dim d ON e.user_id = d.user_id " +
        "AND e.us >= d.valid_from AND e.us < d.valid_to ORDER BY e.event_id"),
    "range_join_1h" ->
      ("SELECT p.event_id, count(e.user_id) AS n_follow " +
        "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p " +
        "LEFT JOIN events e ON e.user_id = p.user_id " +
        "AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR " +
        "GROUP BY p.event_id ORDER BY p.event_id"),
    "skew_salted_agg" ->
      ("SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"),
    "count_distinct_users" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_users FROM events " +
        "GROUP BY event_type ORDER BY event_type"),
    "approx_distinct_audit" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "approx_quantile_audit" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_exact, " +
        "round(quantile_cont(value, 0.95), 6) AS p95_exact, TRUE AS approx_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "quantiles_value" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
        "round(quantile_cont(value, 0.95), 6) AS p95 FROM events " +
        "GROUP BY event_type ORDER BY event_type"),
    "rollup_revenue" ->
      ("SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue " +
        "FROM region JOIN nation ON r_regionkey = n_regionkey " +
        "JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"),
    "window_topn" ->
      ("SELECT o_custkey, o_orderkey, rnk FROM (" +
        "SELECT o_custkey, o_orderkey, CAST(row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk FROM orders) " +
        "WHERE rnk <= 3 ORDER BY o_custkey, rnk"),
    "a2_avg_value" ->
      ("SELECT event_type, round(avg(value), 6) AS avg_value FROM events " +
        "GROUP BY event_type ORDER BY event_type"),
    "a3_sample_avg" ->
      ("SELECT source, round(avg(n_chars), 6) AS avg_chars, count(*) AS n_sampled FROM (" +
        "SELECT source, n_chars, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn " +
        "FROM documents) WHERE rn <= 5 GROUP BY source ORDER BY source"),
    "t1_window_agg" ->
      ("SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type, count(*) AS n " +
        "FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"),
    "t1_window_distinct" ->
      ("SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type, " +
        "count(DISTINCT user_id) AS n_users, TRUE AS approx_ok " +
        "FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"),
    "session_window_agg" ->
      ("SELECT user_id, min(ts) AS session_start, count(*) AS n_events FROM (" +
        "SELECT user_id, ts, sum(is_new) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM (" +
        "SELECT user_id, event_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS is_new " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))) " +
        "GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "sessionize" ->
      ("SELECT user_id, event_id, CAST(session_id AS BIGINT) AS session_id FROM (" +
        "SELECT user_id, event_id, sum(is_new) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM (" +
        "SELECT user_id, event_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))) " +
        "ORDER BY user_id, event_id"),
    "hot_key_drops" ->
      ("SELECT 'sessionize_audit' AS op, user_id, CAST(count(*) - 50 AS BIGINT) AS dropped_events " +
        "FROM events GROUP BY user_id HAVING count(*) > 50 ORDER BY user_id"),
    "funnel_steps" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), " +
        "s1 AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT ev.user_id, CAST(min(ev.us) AS BIGINT) AS t_click FROM ev JOIN s1 ON ev.user_id = s1.user_id " +
        "WHERE ev.event_type = 'click' AND ev.us > s1.t_view GROUP BY ev.user_id), " +
        "s3 AS (SELECT ev.user_id, CAST(min(ev.us) AS BIGINT) AS t_purchase FROM ev JOIN s2 ON ev.user_id = s2.user_id " +
        "WHERE ev.event_type = 'purchase' AND ev.us > s2.t_click GROUP BY ev.user_id) " +
        "SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase, " +
        "CAST(1 + CASE WHEN s2.t_click IS NOT NULL THEN 1 ELSE 0 END + " +
        "CASE WHEN s3.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_depth " +
        "FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id LEFT JOIN s3 ON s1.user_id = s3.user_id " +
        "ORDER BY s1.user_id"),
    "funnel_steps_4" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), " +
        "s1 AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t_signup FROM ev WHERE event_type = 'signup' GROUP BY user_id), " +
        "s2 AS (SELECT ev.user_id, CAST(min(ev.us) AS BIGINT) AS t_view FROM ev JOIN s1 ON ev.user_id = s1.user_id " +
        "WHERE ev.event_type = 'view' AND ev.us > s1.t_signup GROUP BY ev.user_id), " +
        "s3 AS (SELECT ev.user_id, CAST(min(ev.us) AS BIGINT) AS t_click FROM ev JOIN s2 ON ev.user_id = s2.user_id " +
        "WHERE ev.event_type = 'click' AND ev.us > s2.t_view GROUP BY ev.user_id), " +
        "s4 AS (SELECT ev.user_id, CAST(min(ev.us) AS BIGINT) AS t_purchase FROM ev JOIN s3 ON ev.user_id = s3.user_id " +
        "WHERE ev.event_type = 'purchase' AND ev.us > s3.t_click GROUP BY ev.user_id) " +
        "SELECT s1.user_id, s1.t_signup, s2.t_view, s3.t_click, s4.t_purchase, " +
        "CAST(1 + CASE WHEN s2.t_view IS NOT NULL THEN 1 ELSE 0 END + " +
        "CASE WHEN s3.t_click IS NOT NULL THEN 1 ELSE 0 END + " +
        "CASE WHEN s4.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_depth " +
        "FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id LEFT JOIN s3 ON s1.user_id = s3.user_id " +
        "LEFT JOIN s4 ON s1.user_id = s4.user_id ORDER BY s1.user_id"),
    "window_funnel" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), " +
        "a1 AS (SELECT user_id, us AS t0, us AS tp FROM ev WHERE event_type = 'view'), " +
        "a2 AS (SELECT ev.user_id, a1.t0, min(ev.us) AS tp FROM ev JOIN a1 ON ev.user_id = a1.user_id " +
        "WHERE ev.event_type = 'click' AND ev.us > a1.tp AND ev.us <= a1.t0 + 172800000000 " +
        "GROUP BY ev.user_id, a1.t0), " +
        "a3 AS (SELECT ev.user_id, a2.t0, min(ev.us) AS tp FROM ev JOIN a2 ON ev.user_id = a2.user_id " +
        "WHERE ev.event_type = 'purchase' AND ev.us > a2.tp AND ev.us <= a2.t0 + 172800000000 " +
        "GROUP BY ev.user_id, a2.t0), " +
        "lv AS (SELECT user_id, 1 AS lvl FROM a1 " +
        "UNION ALL SELECT user_id, 2 FROM a2 UNION ALL SELECT user_id, 3 FROM a3) " +
        "SELECT user_id, CAST(max(lvl) AS INT) AS funnel_level FROM lv " +
        "GROUP BY user_id ORDER BY user_id"),
    "retention_cohorts" ->
      ("WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events), " +
        "f AS (SELECT user_id, min(us) // 604800000000 AS cohort_week FROM ev GROUP BY user_id), " +
        "a AS (SELECT DISTINCT user_id, us // 604800000000 AS week FROM ev) " +
        "SELECT f.cohort_week, a.week - f.cohort_week AS week_offset, " +
        "CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users " +
        "FROM a JOIN f ON a.user_id = f.user_id " +
        "GROUP BY 1, 2 ORDER BY cohort_week, week_offset")
  )
}
