package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan battery for the TPC-H headline queries (Q1/Q6/Q18) over the btr
  * source: correctness is the DuckDB oracle's job (q_tpch_* rows in the
  * driver gate); these tests pin the PHYSICAL SHAPE that makes the same
  * plan survive at 100 TB — filters pushed into the scan, columns pruned,
  * two-phase aggregation, and a broadcast (not shuffle) join for the tiny
  * qualifying-orders set.
  */
class TpchPlanSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("tpch-plan-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE finalizes its stages
    df.queryExecution.executedPlan
  }

  /** Pre-AQE physical plan: join strategies and scan pushdowns as the
    * planner chose them. The subquery-heavy queries assert on THIS —
    * at sf0.001 their selective dim filters can produce empty runtime
    * sides, and AQE's empty-relation propagation then (correctly)
    * deletes the very semi/anti joins the test pins.
    */
  private def initialPlan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  private def scanLeaves(p: SparkPlan): Seq[String] =
    collectLeaves(p).map(_.toString)

  test("Q1: shipdate filter and 7-column projection reach the scan; agg is two-phase") {
    val p = plan("q_tpch_q1")
    val scans = scanLeaves(p)
    assert(scans.nonEmpty)
    val li = scans.find(_.contains("l_returnflag")).getOrElse(fail(s"no lineitem scan in:\n$p"))
    assert(li.contains("l_shipdate"), s"shipdate filter not pushed:\n$li")
    // pruned: the scan must not read the unused key/string columns
    for (c <- Seq("l_comment", "l_partkey", "l_suppkey", "l_orderkey"))
      assert(!li.contains(c), s"unpruned column $c in scan:\n$li")
    val aggs = collect(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected partial+final hash aggregate:\n$p")
    // no exchange moves raw lineitem rows: every shuffle (group-by hash,
    // order-by range) sits above an aggregate, so only 6-row group
    // summaries ever cross the wire
    val exchanges = collect(p) { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val aggBelow = collect(e.child) {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }
      assert(aggBelow.nonEmpty, s"exchange shuffles pre-aggregate rows:\n$e")
    }
  }

  test("Q6: every predicate is pushed; scan reads only the 4 filter/agg columns") {
    val p = plan("q_tpch_q6")
    val li = scanLeaves(p).headOption.getOrElse(fail(s"no scan in:\n$p"))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(li.contains(c), s"filter on $c not pushed:\n$li")
    for (c <- Seq("l_returnflag", "l_orderkey", "l_tax"))
      assert(!li.contains(c), s"unpruned column $c in scan:\n$li")
  }

  test("Q3: every dim/fact filter reaches its scan; top-k is TakeOrdered, not a global sort") {
    val p = plan("q_tpch_q3")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("c_mktsegment") && s.contains("EqualTo")),
      s"customer segment filter not pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("o_orderdate") && s.contains("LessThan")),
      "orders date filter not pushed")
    assert(scans.exists(s => s.contains("l_shipdate") && s.contains("GreaterThan")),
      "lineitem shipdate filter not pushed")
    val topk = collect(p) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    val globalSorts = collect(p) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(topk.nonEmpty && globalSorts.isEmpty,
      s"limit 10 must plan as TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("CBO on: footer column stats keep the pinned plan shapes (Q3/Q5)") {
    // the v6 NDV sketches + min/max feed FilterEstimation/JoinEstimation
    // when cost-based optimization is on — this guards that REAL column
    // stats never degrade the plans the battery pins (a bad NDV could
    // e.g. flip a broadcast into a shuffle join)
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    val prevReorder = spark.conf.getOption("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      val p3 = plan("q_tpch_q3")
      assert(collect(p3) {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, s"Q3 under CBO lost its top-k plan:\n$p3")
      assert(scanLeaves(p3).exists(s => s.contains("c_mktsegment") && s.contains("EqualTo")),
        "Q3 under CBO lost the customer filter pushdown")
      val p5 = plan("q_tpch_q5")
      val broadcasts = collect(p5) { case b: BroadcastHashJoinExec => b }
      assert(broadcasts.nonEmpty, s"Q5 under CBO lost its broadcast dims:\n$p5")
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(s) => spark.conf.set(k, s)
        case None => spark.conf.unset(k)
      }
      restore("spark.sql.cbo.enabled", prevCbo)
      restore("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }

  test("Q14: one-month shipdate range is pushed; join feeds a single partial-agg row") {
    val p = plan("q_tpch_q14")
    val li = scanLeaves(p).find(_.contains("l_shipdate"))
      .getOrElse(fail(s"no lineitem scan with pushed shipdate:\n$p"))
    assert(li.contains("GreaterThanOrEqual") && li.contains("LessThan"),
      s"range endpoints not pushed:\n$li")
    for (c <- Seq("l_orderkey", "l_quantity", "l_tax"))
      assert(!li.contains(c), s"unpruned column $c in scan:\n$li")
  }

  test("Q18: qualifying orders join is broadcast, not a shuffle of orders") {
    val p = plan("q_tpch_q18")
    val bhj = collect(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected broadcast hash join for the sum(qty)>300 set:\n$p")
  }

  test("Q5: region/date filters reach their scans; dims join by broadcast") {
    val p = plan("q_tpch_q5")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("r_name") && s.contains("EqualTo")),
      s"region name filter not pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("o_orderdate") &&
      s.contains("GreaterThanOrEqual") && s.contains("LessThan")),
      "orders date range not pushed")
    val bhj = collect(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected broadcast joins for the dimension tables:\n$p")
  }

  test("Q10: returnflag + date filters pushed; top-20 is TakeOrdered, not a global sort") {
    val p = plan("q_tpch_q10")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("EqualTo(l_returnflag,R)")),
      s"returnflag filter not pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("o_orderdate") && s.contains("GreaterThanOrEqual")),
      "orders date range not pushed")
    val topk = collect(p) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    val globalSorts = collect(p) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(topk.nonEmpty && globalSorts.isEmpty,
      s"limit 20 must plan as TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("Q19: the OR of conjunctions CNF-factors into per-table Or filters on both scans") {
    val p = plan("q_tpch_q19")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("Or(") && s.contains("l_quantity")),
      s"lineitem quantity disjunction not pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("Or(") && s.contains("p_brand")),
      s"part brand/size disjunction not pushed:\n${scans.mkString("\n")}")
  }

  test("Q4: the correlated EXISTS decorrelates to a semi join; order date filter pushed") {
    val p = plan("q_tpch_q4")
    // LeftSemi in either hash-join flavor (AQE picks at runtime)
    val semi = collect(p) {
      case j: BroadcastHashJoinExec if j.joinType.toString == "LeftSemi" => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.joinType.toString == "LeftSemi" => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if j.joinType.toString == "LeftSemi" => j
    }
    assert(semi.nonEmpty, s"EXISTS did not plan as a semi join:\n$p")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("o_orderdate") && s.contains("GreaterThanOrEqual")),
      s"order date range not pushed to the orders scan:\n${scans.mkString("\n")}")
  }

  test("Q12: shipdate year is pushed to lineitem; agg is two-phase over the join") {
    val p = plan("q_tpch_q12")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("l_shipdate") && s.contains("GreaterThanOrEqual")),
      s"shipdate range not pushed:\n${scans.mkString("\n")}")
    // only the 3 needed lineitem columns reach the scan
    val li = scans.find(_.contains("l_shipdate")).get
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_partkey"))
      assert(!li.contains(c), s"unpruned column $c in scan:\n$li")
    val aggs = collect(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected partial+final aggregation:\n$p")
  }

  test("Q17: correlated scalar subqueries decorrelate to per-part aggregates, brand filter pushed") {
    val p = plan("q_tpch_q17")
    val scans = scanLeaves(p)
    assert(scans.exists(_.contains("EqualTo(p_brand,Brand#13)")),
      s"brand equality not pushed to the part scan:\n${scans.mkString("\n")}")
    // the subqueries became aggregates below a join — no nested-loop
    // per-row subquery execution survives
    val aggs = collect(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected decorrelated per-part aggregates:\n$p")
    assert(collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"nested-loop join in Q17 plan:\n$p")
  }

  private def semiJoins(p: SparkPlan) = collect(p) {
    case j: BroadcastHashJoinExec if j.joinType.toString.startsWith("LeftSemi") => j
    case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
      if j.joinType.toString.startsWith("LeftSemi") => j
    case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
      if j.joinType.toString.startsWith("LeftSemi") => j
  }

  private def antiJoins(p: SparkPlan) = collect(p) {
    case j: BroadcastHashJoinExec if j.joinType.toString.startsWith("LeftAnti") => j
    case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
      if j.joinType.toString.startsWith("LeftAnti") => j
    case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
      if j.joinType.toString.startsWith("LeftAnti") => j
  }

  private def noNestedLoop(p: SparkPlan, q: String): Unit =
    assert(collect(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"nested-loop join in $q plan:\n$p")

  test("Q2: part filters pushed; the correlated min decorrelates — no per-row nested loop") {
    val p = initialPlan("q_tpch_q2")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("EqualTo(p_size,15)") && s.contains("EqualTo(p_type,LARGE)")),
      s"part size/type equalities not pushed:\n${scans.mkString("\n")}")
    noNestedLoop(p, "Q2")
    val aggs = collect(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected decorrelated per-part min aggregates:\n$p")
  }

  test("Q7: nation pair rides broadcast joins; shipdate range pushed to lineitem") {
    val p = initialPlan("q_tpch_q7")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("l_shipdate") && s.contains("GreaterThanOrEqual")),
      s"shipdate range not pushed:\n${scans.mkString("\n")}")
    val bhj = collect(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 2, s"expected broadcast joins for nation/supplier legs:\n$p")
  }

  test("Q8: every dim leg broadcasts; part type and order date filters pushed") {
    val p = initialPlan("q_tpch_q8")
    val scans = scanLeaves(p)
    assert(scans.exists(_.contains("EqualTo(p_type,ECONOMY)")),
      s"part type equality not pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("o_orderdate") && s.contains("GreaterThanOrEqual")),
      "orders date range not pushed")
    val bhj = collect(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3, s"expected broadcast joins for part/nation/supplier legs:\n$p")
  }

  test("Q9: name-filtered part broadcasts with pruned columns; agg is two-phase") {
    val p = initialPlan("q_tpch_q9")
    val scans = scanLeaves(p)
    // the broadcast part leg must carry only the join key + cost column
    val part = scans.find(_.contains("p_retailprice")).getOrElse(fail(s"no part scan:\n$p"))
    for (c <- Seq("p_brand", "p_type", "p_size"))
      assert(!part.contains(c), s"unpruned column $c in part scan:\n$part")
    val bhj = collect(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 2, s"expected broadcast part/supplier/nation joins:\n$p")
    val aggs = collect(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected partial+final aggregation:\n$p")
  }

  test("Q11: per-part values aggregate two-phase; the total is one scalar subquery, no nested loop") {
    val p = initialPlan("q_tpch_q11")
    noNestedLoop(p, "Q11")
    val aggs = collect(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected two-phase value aggregation:\n$p")
  }

  test("Q13: priority exclusion pushed to orders; outer join keeps zero-order customers") {
    val p = initialPlan("q_tpch_q13")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("o_orderpriority") && s.contains("Not")),
      s"priority exclusion not pushed:\n${scans.mkString("\n")}")
    val outer = collect(p) {
      case j: BroadcastHashJoinExec if j.joinType.toString.contains("Outer") => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.joinType.toString.contains("Outer") => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if j.joinType.toString.contains("Outer") => j
    }
    assert(outer.nonEmpty, s"expected an outer join for zero-order customers:\n$p")
  }

  test("Q15: quarter range pushed; revenue CTE aggregates map-side before its 100-row shuffle") {
    val p = initialPlan("q_tpch_q15")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("l_shipdate") && s.contains("GreaterThanOrEqual") &&
      s.contains("LessThan")), s"quarter range not pushed:\n${scans.mkString("\n")}")
    noNestedLoop(p, "Q15")
    val exchanges = collect(p) { case e: ShuffleExchangeExec => e }
    exchanges.foreach { e =>
      val aggBelow = collect(e.child) {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }
      assert(aggBelow.nonEmpty, s"exchange shuffles pre-aggregate lineitem rows:\n$e")
    }
  }

  test("Q16: NOT IN plans as an anti join; size IN-list pushed to the part scan") {
    val p = initialPlan("q_tpch_q16")
    assert(antiJoins(p).nonEmpty, s"NOT IN did not plan as an anti join:\n$p")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("In(p_size")),
      s"size IN-list not pushed:\n${scans.mkString("\n")}")
  }

  test("Q20: the IN subquery plans as a semi join; name prefix pushed to the part scan") {
    val p = initialPlan("q_tpch_q20")
    assert(semiJoins(p).nonEmpty, s"IN did not plan as a semi join:\n$p")
    val scans = scanLeaves(p)
    assert(scans.exists(_.contains("StringStartsWith(p_name,small")),
      s"name prefix not pushed:\n${scans.mkString("\n")}")
    noNestedLoop(p, "Q20")
  }

  test("Q21: EXISTS is a semi join, NOT EXISTS an anti join; status filter pushed") {
    val p = initialPlan("q_tpch_q21")
    assert(semiJoins(p).nonEmpty, s"EXISTS did not plan as a semi join:\n$p")
    assert(antiJoins(p).nonEmpty, s"NOT EXISTS did not plan as an anti join:\n$p")
    val scans = scanLeaves(p)
    assert(scans.exists(_.contains("EqualTo(o_orderstatus,F)")),
      s"order status filter not pushed:\n${scans.mkString("\n")}")
  }

  test("Q22: NOT EXISTS on dated orders is an anti join with the date pushed to its scan") {
    val p = initialPlan("q_tpch_q22")
    assert(antiJoins(p).nonEmpty, s"NOT EXISTS did not plan as an anti join:\n$p")
    val scans = scanLeaves(p)
    assert(scans.exists(s => s.contains("o_orderdate") && s.contains("GreaterThanOrEqual")),
      s"date cutoff not pushed to the orders probe scan:\n${scans.mkString("\n")}")
  }
}
