package graft

import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.vpl.{StmtFnCall, VplInterp, VplParser}

/** The per-task argument-tuple memo in [[StmtFnCall]] must be a pure
  * transparent cache: memoized results ≡ direct interpreter results
  * on every call pattern — heavy repeats (the x8 shape: 97 distinct
  * seeds over 10k events), cold misses, LRU eviction past the cap,
  * and null propagation.
  */
class StmtFnMemoSpec extends AnyFunSuite {

  private val prog = VplParser.parse(graft.queries.VplQueries.stmtFnVpl)
  private val fns = prog.fns.map(f => f.name -> f).toMap

  private def direct(v: Long): Long =
    VplInterp.callFn(fns, fns("collatz_steps"), Seq(v), 1000000L)
      .asInstanceOf[Long]

  test("memoized invoke ≡ direct interpreter on a repeat-heavy corpus") {
    val call = StmtFnCall("collatz_steps", fns, LongType, Nil)
    val rnd = new scala.util.Random(7)
    val corpus = Seq.fill(5000)(rnd.nextInt(97).toLong + 1)
    corpus.foreach { v =>
      assert(call.invoke(Array(Long.box(v))) == direct(v), s"seed $v")
    }
  }

  test("LRU eviction past the cap stays correct (re-misses recompute)") {
    val call = StmtFnCall("collatz_steps", fns, LongType, Nil)
    // 3x the cap of distinct args, then revisit the evicted head
    val n = StmtFnCall.memoCap * 3
    (1 to n).foreach { v =>
      assert(call.invoke(Array(Long.box(v.toLong))) == direct(v.toLong))
    }
    (1 to 64).foreach { v =>
      assert(call.invoke(Array(Long.box(v.toLong))) == direct(v.toLong),
        s"post-eviction revisit $v")
    }
  }

  test("null arguments short-circuit to null without touching the memo") {
    val call = StmtFnCall("collatz_steps", fns, LongType, Nil)
    assert(call.invoke(Array(null)) == null)
    assert(call.invoke(Array(Long.box(6L))) == direct(6L))
    assert(call.invoke(Array(null)) == null)
  }
}
