package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic forAll over scalacheck Gens (the scalatestplus
  * bridge isn't in the offline cache; seeds are fixed so test runs are
  * reproducible). */
trait PropHelpers {
  val propRuns = 200

  private def sample[A](g: Gen[A], i: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(i), retries = 1000)

  def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until propRuns).foreach(i => f(sample(g, i.toLong)))

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until propRuns).foreach(i => f(sample(ga, i.toLong), sample(gb, i + 10000L)))

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    (0 until propRuns).foreach(i =>
      f(sample(ga, i.toLong), sample(gb, i + 10000L), sample(gc, i + 20000L)))

  def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    (0 until propRuns).foreach(i => f(sample(ga, i.toLong), sample(gb, i + 10000L),
      sample(gc, i + 20000L), sample(gd, i + 30000L)))
}
