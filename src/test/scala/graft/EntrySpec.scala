package graft

/** Driver-contract guards: the smoke entry returns rows; every oracle
  * key names a real query; results stay non-empty at the smoke SF
  * (rows-only checks are meaningless on empty output).
  */
class EntrySpec extends SparkSpec {

  test("entry (t1 smoke): flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries return rows on sf0.001") {
    val empty = (SparkEntry.queries ++ SparkEntry.benchOnly)
      .flatMap { case (name, fn) =>
        val n = fn(spark, sf("sf0.001")).count()
        if (n == 0) Some(name) else None
      }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("benchOnly is disjoint from queries and never oracled") {
    // benchOnly exists precisely because these configurations are
    // approximate by design: an entry drifting into queries/oracleSql
    // would reintroduce an unverifiable correctness row
    assert((SparkEntry.benchOnly.keySet & SparkEntry.queries.keySet).isEmpty)
    assert((SparkEntry.benchOnly.keySet & SparkEntry.oracleSql.keySet).isEmpty)
  }
}
