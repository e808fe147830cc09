package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Property checks for the r8 native fold expressions, against
  * independent recomputations (Catalyst's own interpreted HOF fold
  * for EMA, a straight Scala loop for Hawkes, invariants for BPE):
  * randomized inputs with a fixed seed, exact equality where the
  * determinism contract promises it.
  */
class FoldPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  test("EmaFold equals Catalyst's interpreted aggregate() fold exactly") {
    import spark.implicits._
    val rows = (1 to 60).map { i =>
      val n = rnd.nextInt(30)
      val xs = Seq.fill(n)(math.round(rnd.nextDouble() * 1e6) / 1e3)
      (i.toLong, xs.zipWithIndex.map { case (v, j) => (j.toLong, v) })
    }
    val df = rows.toDF("id", "xs")
    val a = 2.0 / 11.0
    val b = 1.0 - a
    val native = df.select(col("id"),
      ColumnBridge.column(graft.functions.EmaFold(
        ColumnBridge.expression(col("xs")), a, b)).as("e"))
    // the interpreted HOF formulation the native expression replaced
    val hof = df.select(col("id"),
      aggregate(col("xs"), lit(null).cast("double"),
        (acc, e) => when(acc.isNull, e.getField("_2"))
          .otherwise(lit(a) * e.getField("_2") + lit(b) * acc)).as("e"))
    val got = native.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    val want = hof.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(got == want)
    // empty input -> null (only checkable when the draw produced one)
    rows.collectFirst { case (id, xs) if xs.isEmpty => id }
      .foreach(id => assert(got(id) == null))
  }

  test("EmaFold null semantics: propagate (a2/SQL) vs reset (VPL)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq((1L, Option(2.0)), (2L, None: Option[Double]), (3L, Some(4.0)))),
      (2L, Seq((1L, Option(2.0)), (2L, Some(4.0))))
    ).toDF("id", "xs")
    def run(resets: Boolean) = df.select(col("id"),
      ColumnBridge.column(graft.functions.EmaFold(
        ColumnBridge.expression(col("xs")), 0.5, 0.5, resets)).as("e"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null
         else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    val prop = run(false)
    assert(prop(1L) == null, "null value nulls the whole fold (oracle parity)")
    assert(prop(2L) == 3.0)
    val reset = run(true)
    assert(reset(1L) == 4.0, "null resets; next non-null restarts")
    assert(reset(2L) == 3.0)
  }

  test("HawkesFold equals a straight Scala recursion bit for bit") {
    import spark.implicits._
    val (mu, alpha, beta) = (0.002, 0.004, 0.0007)
    val keys = (1 to 40).map { k =>
      var t = 1700000000000000L + rnd.nextInt(1000000)
      val evs = (1 to (1 + rnd.nextInt(50))).map { o =>
        t += 1000L + rnd.nextInt(5000000)
        (o.toLong, t)
      }
      (k.toLong, evs)
    }
    val df = keys.toDF("k", "evs")
    val got = df.select(col("k"),
      ColumnBridge.column(graft.functions.HawkesFold(
        ColumnBridge.expression(col("evs")), mu, alpha, beta)).as("res"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getDouble(1)))
      }.toMap
    keys.foreach { case (k, evs) =>
      var li = 0.0
      var lt = -1L
      val want = evs.map { case (o, t) =>
        li = if (lt < 0) mu + alpha
             else mu + (li - mu + alpha) * Math.exp(-beta * (t - lt) / 1e6)
        lt = t
        (o, li)
      }
      assert(got(k) == want, s"key $k diverged")
    }
  }

  test("BpeEncode invariants on random corpora") {
    import spark.implicits._
    val alphabet = "abcd"
    def word(): String =
      Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(4))).mkString
    val docs = (1 to 40).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(10))(word()).mkString(" ")))
      .toDF("doc_id", "text")
    // random merge table over the alphabet + some 2-char symbols
    val syms = alphabet.map(_.toString) ++ Seq("ab", "cd", "bc")
    val merges = Seq.fill(6)(
      (syms(rnd.nextInt(syms.size)), syms(rnd.nextInt(syms.size)))).distinct
    val enc = graft.text.TextAnalysis.bpeEncode(docs, col("text"), merges)
    // losslessness: token concat == word concat
    val wordChars = docs.select(col("doc_id"),
      length(array_join(graft.functions.TextFunctions.words(col("text")), ""))
        .cast("long").as("wc"))
    assert(enc.join(wordChars, "doc_id")
      .filter(col("n_chars") =!= col("wc")).isEmpty)
    // bounds: words <= tokens <= chars
    assert(enc.filter(col("n_tokens") < col("n_words")).isEmpty)
    assert(enc.filter(col("n_tokens") > col("n_chars")).isEmpty)
    // determinism: a second run is identical
    val again = graft.text.TextAnalysis.bpeEncode(docs, col("text"), merges)
    assert(enc.exceptAll(again).isEmpty && again.exceptAll(enc).isEmpty)
  }
}
