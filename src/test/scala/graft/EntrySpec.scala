package graft

/** Mirrors the driver's t1 smoke: entry() returns rows, and every
  * declared query key has a runnable definition. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; keys are well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
    assert(q.forall(_.matches("[a-z][a-z0-9_]*")))
    assert(q.size >= 52)
    // every oracle references at least one known table
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(Tables.all.exists(t => sql.contains(t)), s"$k oracle references no table")
    }
  }
}
