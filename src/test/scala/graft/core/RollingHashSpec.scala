package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class RollingHashSpec extends AnyFunSuite with PropHelpers {

  test("window hashes agree with BigInt reference arithmetic") {
    val strGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 0x2FFF)).map(_.map(_.toChar).mkString))
    val mod = BigInt(RollingHash.Mod)
    val base = BigInt(RollingHash.Base)
    forAll(strGen, Gen.chooseNum(1, 12)) { (s, w) =>
      val hs = RollingHash.hashWindows(s, w)
      if (s.length >= w) {
        (0 until math.min(hs.length, 5)).foreach { i =>
          val win = s.substring(i, i + w)
          val ref = win.foldLeft(BigInt(0))((acc, c) =>
            (acc * base + BigInt(c.toInt)) mod mod)
          assert(BigInt(hs(i)) == ref, s"win=$win")
        }
      }
    }
  }

  test("minSketch is sorted, distinct, and a subset of window hashes") {
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val sk = RollingHash.minSketch(s, 8, 5)
      assert(sk.sameElements(sk.sorted.distinct))
      val all = RollingHash.hashWindows(s, 8).toSet
      assert(sk.forall(all.contains))
      assert(RollingHash.minFingerprint(s, 8) == RollingHash.hashWindows(s, 8).min)
    }
  }
}
