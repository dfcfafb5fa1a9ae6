package graft

/** Automated guard for SURVEY §4's scan-efficiency claims: column
  * pruning and predicate pushdown must actually reach the parquet
  * scan. At 100 TB a scan that reads all columns for a 7-column
  * aggregation, or applies its filter post-scan, is the difference
  * between reading 100 TB and reading the needed slice — regressions
  * here are silent locally and catastrophic at scale, hence plan
  * assertions rather than one-off `.explain` checks.
  */
class PushdownSpec extends SparkSpec {

  private def scanLines(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).toSeq

  test("q_agg prunes unused lineitem columns and pushes the shipdate filter") {
    val scans = scanLines("q_agg")
    assert(scans.nonEmpty)
    val s = scans.mkString("\n")
    // 7 needed columns only — the join keys/comment-style columns must
    // not be read
    assert(!s.contains("l_partkey") && !s.contains("l_suppkey") &&
      !s.contains("l_orderkey"), s)
    assert(s.contains("l_shipdate") && s.contains("l_quantity"), s)
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      s.contains("LessThanOrEqual(l_shipdate"), s)
  }

  test("q_window reads only the four orders columns it uses") {
    // key, sort keys (o_orderdate, o_orderkey) and the summed measure —
    // nothing else
    val s = scanLines("q_window").mkString("\n")
    assert(s.contains("o_custkey") && s.contains("o_orderdate") &&
      !s.contains("o_orderpriority") && !s.contains("o_orderstatus"), s)
  }

  test("text queries never read the unused documents payload columns") {
    val s = scanLines("text_tokens").mkString("\n")
    assert(s.contains("text") && !s.contains("source") && !s.contains("n_chars"), s)
  }

  test("knn_ivf_pruned reads only probed index partitions") {
    val idxScan = scanLines("knn_ivf_pruned").filter(_.contains("graft_ivf_index"))
    assert(idxScan.nonEmpty)
    val s = idxScan.mkString("\n")
    assert(s.contains("PartitionFilters: [") && !s.contains("PartitionFilters: []"), s)
  }

  test("q_dpp_join prunes fact partitions dynamically from the dim join") {
    val factScan = scanLines("q_dpp_join").filter(_.contains("graft_dpp_fact"))
    assert(factScan.nonEmpty)
    val s = factScan.mkString("\n")
    assert(s.contains("dynamicpruning"), s)
  }

  test("partition-pruned sink read-back scans only the selected partition") {
    val s = scanLines("sink_parquet_partitioned").mkString("\n")
    // partition filters must be pushed as partition (not data) filters
    assert(s.contains("PartitionFilters: [") &&
      !s.contains("PartitionFilters: []"), s)
  }

  test("q_latest_by_key compacts via partial max_by aggregation, not a window sort") {
    val plan = SparkEntry.queries("q_latest_by_key")(spark, sf)
      .queryExecution.executedPlan.toString
    // the whole point vs the naive row_number formulation: map-side
    // partial aggregation, no per-key Window
    assert(plan.contains("partial_max_by") || plan.contains("max_by"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q_semi_join reads only the key and filter columns of orders") {
    val s = scanLines("q_semi_join").filter(_.contains("orders")).mkString("\n")
    assert(s.contains("o_custkey") && s.contains("o_orderpriority"), s)
    assert(!s.contains("o_totalprice") && !s.contains("o_orderdate"), s)
  }

  test("q_grouping_sets expands grouping sets map-side (Expand, one shuffle)") {
    val plan = SparkEntry.queries("q_grouping_sets")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
