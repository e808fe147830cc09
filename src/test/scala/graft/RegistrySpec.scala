package graft

/** Every registered query builds, runs, and (where guaranteed by the
  * test data) produces rows at sf0.001. Oracle equivalence itself is
  * checked by the driver / scripts/local_verify.py — these specs are
  * the cheap always-on gate.
  */
class RegistrySpec extends SparkSpec {

  // queries that legitimately may be empty at this tiny scale
  // (the 3-step chains first fire at sf0.01)
  private val mayBeEmpty =
    Set("d3_minhash_lsh", "d4_simhash", "p2_seq3", "p9_transition_within")

  SparkEntry.all.foreach { case (name, qd) =>
    test(s"$name runs at sf0.001") {
      val df = qd.build(spark, sf)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.forall(c => c == c.toLowerCase), "column names lowercase")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
