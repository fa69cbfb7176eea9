package graft

/** Driver-contract smoke: entry() returns rows; every queries key has
  * either an oracleSql entry or is intentionally rows-only.
  */
class EntrySpec extends SparkTestBase {

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (full DuckDB parity, no rows-only gaps)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("all queries run and return deterministic row counts on sf0.001") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, "/root/testdata/sf0.001").count()
    }
    counts.foreach { case (name, c) =>
      assert(c >= 0, s"$name failed")
    }
    // a second run gives identical counts (determinism smoke)
    SparkEntry.queries.toSeq.sortBy(_._1).zip(counts).foreach {
      case ((name, fn), (_, c1)) =>
        if (name != "q_engine_bm25") // rebuilds a temp index; count-stable anyway but slow
          assert(fn(spark, "/root/testdata/sf0.001").count() == c1,
            s"$name count changed between runs")
    }
  }
}
