package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class CellsSpec extends AnyFunSuite with PropHelpers {

  val latGen: Gen[Double] = Gen.chooseNum(-89.99, 89.99)
  val lonGen: Gen[Double] = Gen.chooseNum(-179.99, 179.99)
  val resGen: Gen[Int] = Gen.chooseNum(1, 12)

  test("encode hand vectors") {
    // (0,0) at r=1 -> x=1, y=1 -> morton 0b11 = 3
    assert(Cells.encode(0.0, 0.0, 1) == Cells.mkCell(1, 3L))
    // southwest corner -> morton 0
    assert(Cells.encode(-90.0, -180.0, 5) == Cells.mkCell(5, 0L))
    // northeast clamp
    val ne = Cells.encode(90.0, 180.0, 3)
    assert(Cells.toXY(ne) == ((7L, 7L)))
    assert(Cells.res(ne) == 3)
  }

  test("encode matches DuckDB-oracle arithmetic at r=12 (spot values)") {
    // mirrors the generated oracle SQL for o_orderkey=1..4 (verified in
    // DuckDB this session): lat/lon derived from k like the geo fixture
    def pt(k: Long) = (-60 + (k * 7919 % 12000) / 100.0,
                       -180 + (k * 104729 % 36000) / 100.0)
    val expect = Map(0L -> 864691128455694472L, 1L -> 864691128469211749L,
      2L -> 864691128463065909L, 3L -> 864691128470292141L,
      4L -> 864691128468123383L)
    expect.foreach { case (k, cell) =>
      val (lat, lon) = pt(k)
      assert(Cells.encode(lat, lon, 12) == cell, s"k=$k")
    }
  }

  test("parent(encode(p,12), r) == encode(p, r) for all r <= 12") {
    forAll(latGen, lonGen, resGen) { (lat, lon, r) =>
      val fine = Cells.encode(lat, lon, 12)
      assert(Cells.parent(fine, r) == Cells.encode(lat, lon, r))
    }
  }

  test("children round-trip and containment") {
    forAll(latGen, lonGen, Gen.chooseNum(1, 11)) { (lat, lon, r) =>
      val c = Cells.encode(lat, lon, r)
      val kids = Cells.children(c)
      assert(kids.length == 4)
      kids.foreach { k =>
        assert(Cells.parent(k, r) == c)
        assert(Cells.contains(c, k))
      }
    }
  }

  test("prefixRange brackets all descendants") {
    forAll(latGen, lonGen, Gen.chooseNum(2, 8)) { (lat, lon, r) =>
      val c = Cells.encode(lat, lon, r)
      val (lo, hi) = Cells.prefixRange(c, 12)
      val fine = Cells.encode(lat, lon, 12)
      assert(fine >= lo && fine <= hi)
    }
  }

  test("ring(c,1) has 8 cells away from edges; symmetry a in ring(b,k) <=> b in ring(a,k)") {
    forAll(Gen.chooseNum(-80.0, 80.0), lonGen, Gen.chooseNum(4, 12), Gen.chooseNum(1, 3)) {
      (lat, lon, r, k) =>
        val c = Cells.encode(lat, lon, r)
        val rg = Cells.ring(c, k)
        assert(!rg.contains(c))
        rg.foreach { b => assert(Cells.ring(b, k).contains(c)) }
    }
  }

  test("ring wraps longitude and clamps latitude") {
    val west = Cells.encode(0.0, -179.99, 6) // x = 0
    val ring = Cells.ring(west, 1)
    val n = 1L << 6
    assert(ring.exists(b => Cells.toXY(b)._1 == n - 1)) // wrapped to east edge
    val south = Cells.encode(-89.99, 0.0, 6) // y = 0
    assert(Cells.ring(south, 1).length == 5) // bottom row clipped
  }

  test("disk = union of rings, sorted distinct") {
    val c = Cells.encode(10.0, 10.0, 8)
    val d = Cells.disk(c, 2)
    assert(d.length == 25)
    assert(d.sameElements(d.sorted.distinct))
  }

  test("bounds contains the encoded point; cellToTile == parent") {
    forAll(latGen, lonGen, Gen.chooseNum(7, 12)) { (lat, lon, r) =>
      val c = Cells.encode(lat, lon, r)
      val (la0, la1, lo0, lo1) = Cells.bounds(c)
      assert(lat >= la0 && lat <= la1 && lon >= lo0 && lon <= lo1)
      assert(Cells.cellToTile(c, 7) == Cells.parent(c, 7))
    }
  }

  test("ids are positive and resolution-prefixed ordering is stable") {
    forAll(latGen, lonGen, resGen) { (lat, lon, r) =>
      val c = Cells.encode(lat, lon, r)
      assert(c > 0)
      assert(Cells.res(c) == r)
    }
  }

  test("quadkey: round-trip, prefix == parent, length == resolution") {
    forAll(latGen, lonGen, Gen.chooseNum(1, 12)) { (lat, lon, r) =>
      val c = Cells.encode(lat, lon, r)
      val qk = Cells.quadkey(c)
      assert(qk.length == r && qk.forall(ch => ch >= '0' && ch <= '3'))
      assert(Cells.fromQuadkey(qk) == c) // round-trip
      // THE property that makes it a storage key: ancestor keys are
      // string prefixes, so lexicographic ranges == cell-prefix ranges
      (1 to r).foreach { rp =>
        assert(Cells.quadkey(Cells.parent(c, rp)) == qk.substring(0, rp))
      }
    }
    intercept[IllegalArgumentException](Cells.fromQuadkey("0041x"))
  }
}
