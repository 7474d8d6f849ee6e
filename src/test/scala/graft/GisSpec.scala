package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Gis
import graft.functions.Gis._

class GisSpec extends AnyFunSuite {

  test("WKT point round-trips through WKB") {
    val g = parseWkt("POINT(1.5 -2.25)")
    assert(fromWkb(toWkb(g)) == g)
  }

  test("WKT polygon round-trips through WKB") {
    val g = parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(fromWkb(toWkb(g)) == g)
  }

  test("distance point-point") {
    assert(math.abs(distance(Pt(0, 0), Pt(3, 4)) - 5.0) < 1e-12)
  }

  test("distance point-polygon is zero inside, positive outside") {
    val box = parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))").asInstanceOf[Poly]
    assert(distance(Pt(2, 2), box) == 0.0)
    assert(math.abs(distance(Pt(6, 2), box) - 2.0) < 1e-12)
  }

  test("area via shoelace") {
    val tri = parseWkt("POLYGON((0 0, 4 0, 0 3, 0 0))")
    assert(math.abs(area(tri) - 6.0) < 1e-12)
  }

  test("predicates: within / intersects / disjoint") {
    val a = parseWkt("POLYGON((0 0, 5 0, 5 5, 0 5, 0 0))").asInstanceOf[Poly]
    val b = parseWkt("POLYGON((3 3, 8 3, 8 8, 3 8, 3 3))").asInstanceOf[Poly]
    val c = parseWkt("POLYGON((6 6, 9 6, 9 9, 6 9, 6 6))").asInstanceOf[Poly]
    assert(Gis.intersects(a, b))
    assert(!Gis.intersects(a, c))
    assert(Gis.within(Pt(1, 1), a))
    assert(!Gis.within(Pt(6, 6), a))
    assert(Gis.within(parseWkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"), a))
  }

  test("boundary semantics: contains is interior-only, intersects includes the ring") {
    val box = parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))").asInstanceOf[Poly]
    // every edge class the strict ray cast used to classify inconsistently
    val boundary = Seq(Pt(0, 2), Pt(4, 2), Pt(2, 0), Pt(2, 4), Pt(0, 0), Pt(4, 4))
    boundary.foreach { p =>
      assert(!Gis.contains(box, p), s"$p is on the ring: contains must be false")
      assert(!Gis.within(p, box), s"$p is on the ring: within must be false")
      assert(Gis.intersects(box, p), s"$p is on the ring: intersects must be true")
      assert(Gis.intersects(p, box), s"$p is on the ring: intersects must be true")
      assert(distance(p, box) == 0.0, s"$p is on the ring: distance must be 0")
    }
    assert(Gis.contains(box, Pt(2, 2)))
    assert(!Gis.intersects(box, Pt(5, 2)))
    // a polygon may touch the container's boundary and still be within
    assert(Gis.within(parseWkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"), box))
  }
}
