package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.expressions.{FreqSketch, TopKHeap}

/** Property-based invariants for the mergeable sketch structures: the
  * guarantees must hold for ARBITRARY streams and arbitrary partition
  * splits, not just the fixtures. Uses raw ScalaCheck with a fixed seed
  * so runs are deterministic.
  */
class SketchPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val scoredIds =
    Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 500L)))

  test("TopKHeap equals sort-take-k for arbitrary streams and k") {
    check(Prop.forAll(scoredIds, Gen.chooseNum(1, 20)) { (xs0, k) =>
      // ids must be unique for the total order to be well-defined
      val xs = xs0.groupBy(_._2).map(_._2.head).toSeq
      val heap = new TopKHeap(k)
      xs.foreach { case (s, id) => heap.insert(s, id) }
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(k)
        .map { case (s, id) => (id, s) }
      heap.sortedPairs.toSeq == expect
    })
  }

  test("TopKHeap merge is split-invariant") {
    check(Prop.forAll(scoredIds, Gen.chooseNum(1, 8), Gen.chooseNum(2, 6)) {
      (xs0, k, nParts) =>
        val xs = xs0.groupBy(_._2).map(_._2.head).toSeq
        val whole = new TopKHeap(k)
        val parts = Seq.fill(nParts)(new TopKHeap(k))
        xs.zipWithIndex.foreach { case ((s, id), i) =>
          whole.insert(s, id)
          parts(i % nParts).insert(s, id)
        }
        val merged = new TopKHeap(k)
        parts.foreach(merged.mergeFrom)
        merged.sortedPairs.toSeq == whole.sortedPairs.toSeq
    })
  }

  private val words = Gen.listOf(
    Gen.frequency(3 -> Gen.const("hot"),
      5 -> Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))

  test("FreqSketch estimates are lower bounds within n/(k+1), any split") {
    check(Prop.forAll(words, Gen.chooseNum(2, 6), Gen.chooseNum(1, 5)) {
      (ws, k, nParts) =>
        val parts = Seq.fill(nParts)(new FreqSketch(k))
        ws.zipWithIndex.foreach { case (w, i) => parts(i % nParts).add(w) }
        val merged = new FreqSketch(k)
        parts.foreach(merged.mergeFrom)
        val exact = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val bound = ws.size.toLong / (k + 1)
        val lowerBounds = merged.counters.forall { case (w, est) =>
          val truth = exact.getOrElse(w, 0L)
          est <= truth && truth - est <= bound
        }
        val heaviesKept = exact.forall { case (w, c) =>
          c <= bound || merged.counters.contains(w)
        }
        lowerBounds && heaviesKept
    })
  }
}
