package graft

/** Driver-contract guards: the smoke entry returns rows; every oracle
  * key names a real query; results stay non-empty at the smoke SF
  * (rows-only checks are meaningless on empty output).
  */
class EntrySpec extends SparkSpec {

  test("entry (t1 smoke): flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query (verify surface = " +
      "queries ++ verifyOnly)") {
    val missing = SparkEntry.oracleSql.keySet --
      SparkEntry.queries.keySet -- SparkEntry.verifyOnly.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("verifyOnly twins: every one is oracled (that is their whole " +
      "point), disjoint from the bench surface, and hashes against " +
      "its sibling's exact SQL") {
    val unoracled =
      SparkEntry.verifyOnly.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"verifyOnly without oracle: $unoracled")
    assert((SparkEntry.verifyOnly.keySet &
      SparkEntry.queries.keySet).isEmpty)
    assert((SparkEntry.verifyOnly.keySet &
      SparkEntry.benchOnly.keySet).isEmpty)
    SparkEntry.verifyOnly.keySet.foreach { twin =>
      val sib = twin.stripSuffix("_dist")
      assert(SparkEntry.oracleSql(twin) == SparkEntry.oracleSql(sib),
        s"$twin must share $sib's oracle verbatim")
    }
  }

  test("all queries return rows on sf0.001") {
    val empty =
      (SparkEntry.queries ++ SparkEntry.benchOnly ++ SparkEntry.verifyOnly)
        .flatMap { case (name, fn) =>
          val n = fn(spark, sf("sf0.001")).count()
          if (n == 0) Some(name) else None
        }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("bench floor artifact min-merges same-fingerprint runs, keeps " +
      "failure sentinels out of the min, resets on surface change") {
    val f = java.nio.file.Files.createTempFile("graftfloor", ".json")
      .toString
    def read() = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.readTree(new java.io.File(f))
    }
    Bench.writeFloor(Map("a" -> 2.0, "b" -> 5.0, "c" -> -1.0), "sfX", f)
    assert(read().get("runs").asLong() == 1L)
    // second run: a slower (old min kept), b faster (new min taken),
    // c succeeds (replaces the failure sentinel)
    Bench.writeFloor(Map("a" -> 3.0, "b" -> 4.0, "c" -> 1.5), "sfX", f)
    val n2 = read()
    assert(n2.get("runs").asLong() == 2L)
    assert(n2.get("queries").get("a").asDouble() == 2.0)
    assert(n2.get("queries").get("b").asDouble() == 4.0)
    assert(n2.get("queries").get("c").asDouble() == 1.5)
    assert(n2.get("value").asDouble() == 7.5)
    // surface change (new query set) => different fingerprint => reset
    Bench.writeFloor(Map("a" -> 9.0, "d" -> 1.0), "sfX", f)
    val n3 = read()
    assert(n3.get("runs").asLong() == 1L)
    assert(n3.get("queries").get("a").asDouble() == 9.0)
  }

  test("benchOnly is disjoint from queries and never oracled") {
    // benchOnly exists precisely because these configurations are
    // approximate by design: an entry drifting into queries/oracleSql
    // would reintroduce an unverifiable correctness row
    assert((SparkEntry.benchOnly.keySet & SparkEntry.queries.keySet).isEmpty)
    assert((SparkEntry.benchOnly.keySet & SparkEntry.oracleSql.keySet).isEmpty)
  }
}
