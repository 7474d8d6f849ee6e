package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal planar GIS support — cnosdb's st_* surface (reference
  * query_server/query/src/extension/expr/scalar_function/gis/:
  * st_geomfromwkb, st_asbinary, st_distance, st_area and the binary
  * predicates intersects/contains/within/equals/disjoint, tested in
  * sqllogicaltests/cases/function/gis/).
  *
  * Geometries: POINT, LINESTRING, POLYGON (planar, Euclidean, like the
  * reference's geo-crate usage). Parsing/predicates run as UDFs — GIS
  * is not the 100 TB hot path; the values ride columnar until the
  * predicate.
  */
object Gis {

  sealed trait Geom
  final case class Pt(x: Double, y: Double) extends Geom
  final case class Line(pts: Vector[Pt]) extends Geom
  final case class Poly(ring: Vector[Pt]) extends Geom // closed outer ring

  // ---- WKT ----

  def parseWkt(wkt: String): Geom = {
    val s = wkt.trim
    val open = s.indexOf('(')
    require(open > 0, s"bad WKT: $wkt")
    val tag = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open, s.length)
    def coords(str: String): Vector[Pt] =
      str.replace("(", " ").replace(")", " ").split(",").toVector.map { p =>
        val xs = p.trim.split("\\s+")
        Pt(xs(0).toDouble, xs(1).toDouble)
      }
    tag match {
      case "POINT" => coords(body).head
      case "LINESTRING" => Line(coords(body))
      case "POLYGON" => Poly(coords(body))
      case other => throw new IllegalArgumentException(s"unsupported WKT type: $other")
    }
  }

  def toWkt(g: Geom): String = g match {
    case Pt(x, y) => s"POINT($x $y)"
    case Line(ps) => ps.map(p => s"${p.x} ${p.y}").mkString("LINESTRING(", ",", ")")
    case Poly(ps) => ps.map(p => s"${p.x} ${p.y}").mkString("POLYGON((", ",", "))")
  }

  // ---- WKB (little-endian, 2D) ----

  def toWkb(g: Geom): Array[Byte] = {
    def buf(n: Int) = {
      val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte) // little endian marker
      b
    }
    g match {
      case Pt(x, y) =>
        val b = buf(21); b.putInt(1); b.putDouble(x); b.putDouble(y); b.array()
      case Line(ps) =>
        val b = buf(9 + 16 * ps.length); b.putInt(2); b.putInt(ps.length)
        ps.foreach { p => b.putDouble(p.x); b.putDouble(p.y) }; b.array()
      case Poly(ps) =>
        val b = buf(13 + 16 * ps.length); b.putInt(3); b.putInt(1); b.putInt(ps.length)
        ps.foreach { p => b.putDouble(p.x); b.putDouble(p.y) }; b.array()
    }
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    val b = ByteBuffer.wrap(bytes)
    b.order(if (b.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    b.getInt match {
      case 1 => Pt(b.getDouble, b.getDouble)
      case 2 =>
        val n = b.getInt
        Line(Vector.fill(n)(Pt(b.getDouble, b.getDouble)))
      case 3 =>
        val rings = b.getInt
        require(rings >= 1, "empty polygon")
        val n = b.getInt
        Poly(Vector.fill(n)(Pt(b.getDouble, b.getDouble)))
      case t => throw new IllegalArgumentException(s"unsupported WKB type: $t")
    }
  }

  // ---- measures ----

  private def segDist(p: Pt, a: Pt, b: Pt): Double = {
    val (dx, dy) = (b.x - a.x, b.y - a.y)
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / len2))
    math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
  }

  private def ptDist(a: Pt, b: Pt): Double = math.hypot(a.x - b.x, a.y - b.y)

  private def ringEdges(ps: Vector[Pt]): Iterator[(Pt, Pt)] =
    ps.iterator.zip(ps.iterator.drop(1))

  /** Point exactly on a ring edge (collinear + within the segment's
    * bounding box). Makes boundary behavior deterministic — the strict
    * ray cast below otherwise classifies vertices and right-hand /
    * horizontal edges differently from left-hand ones.
    */
  private def onBoundary(poly: Poly, p: Pt): Boolean =
    ringEdges(poly.ring).exists { case (a, b) =>
      (b.x - a.x) * (p.y - a.y) == (b.y - a.y) * (p.x - a.x) &&
        p.x >= math.min(a.x, b.x) && p.x <= math.max(a.x, b.x) &&
        p.y >= math.min(a.y, b.y) && p.y <= math.max(a.y, b.y)
    }

  /** Interior-only containment — geo-crate `Contains` semantics (the
    * reference's gis functions delegate to geo): a boundary point is NOT
    * contained. `intersects` is the boundary-inclusive predicate.
    * Pinned in GisSpec.
    */
  def contains(poly: Poly, p: Pt): Boolean = {
    if (onBoundary(poly, p)) false
    else {
      var inside = false
      ringEdges(poly.ring).foreach { case (a, b) =>
        if ((a.y > p.y) != (b.y > p.y)) {
          val xint = a.x + (p.y - a.y) * (b.x - a.x) / (b.y - a.y)
          if (p.x < xint) inside = !inside
        }
      }
      inside
    }
  }

  def distance(g1: Geom, g2: Geom): Double = (g1, g2) match {
    case (a: Pt, b: Pt) => ptDist(a, b)
    case (p: Pt, Line(ps)) => ringEdges(ps).map { case (a, b) => segDist(p, a, b) }.min
    case (l: Line, p: Pt) => distance(p, l)
    case (p: Pt, poly: Poly) =>
      if (contains(poly, p)) 0.0
      else ringEdges(poly.ring).map { case (a, b) => segDist(p, a, b) }.min
    case (poly: Poly, p: Pt) => distance(p, poly)
    case (Line(ps1), Line(ps2)) =>
      val crossing = ringEdges(ps1).exists { case (a, b) =>
        ringEdges(ps2).exists { case (c, d) => segsIntersect(a, b, c, d) } }
      if (crossing) 0.0
      else (ps1.iterator.flatMap(p => ringEdges(ps2).map { case (a, b) => segDist(p, a, b) }) ++
        ps2.iterator.flatMap(p => ringEdges(ps1).map { case (a, b) => segDist(p, a, b) })).min
    case (a: Poly, b: Poly) =>
      if (intersects(a, b)) 0.0
      else (a.ring.map(p => distance(p, b)) ++ b.ring.map(p => distance(p, a))).min
    case _ => throw new IllegalArgumentException("unsupported distance pair")
  }

  def area(g: Geom): Double = g match {
    case Poly(ps) =>
      math.abs(ringEdges(ps).map { case (a, b) => a.x * b.y - b.x * a.y }.sum) / 2.0
    case _ => 0.0
  }

  private def segsIntersect(p1: Pt, p2: Pt, p3: Pt, p4: Pt): Boolean = {
    def ccw(a: Pt, b: Pt, c: Pt): Double = (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    val (d1, d2) = (ccw(p3, p4, p1), ccw(p3, p4, p2))
    val (d3, d4) = (ccw(p1, p2, p3), ccw(p1, p2, p4))
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) && ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  def intersects(a: Geom, b: Geom): Boolean = (a, b) match {
    case (p: Pt, q: Pt) => p == q
    // boundary-inclusive (geo Intersects): a point ON the ring intersects
    case (p: Pt, poly: Poly) => contains(poly, p) || onBoundary(poly, p)
    case (poly: Poly, p: Pt) => contains(poly, p) || onBoundary(poly, p)
    case (pa: Poly, pb: Poly) =>
      pa.ring.exists(p => contains(pb, p) || onBoundary(pb, p)) ||
        pb.ring.exists(p => contains(pa, p) || onBoundary(pa, p)) ||
        ringEdges(pa.ring).exists { case (s1, s2) =>
          ringEdges(pb.ring).exists { case (t1, t2) => segsIntersect(s1, s2, t1, t2) } }
    case _ => throw new IllegalArgumentException("unsupported intersects pair")
  }

  def within(inner: Geom, outer: Geom): Boolean = (inner, outer) match {
    // point-in-polygon: interior only (geo Within of a point mirrors
    // Contains); a polygon may touch the outer boundary (A ∩ B = A).
    case (p: Pt, poly: Poly) => contains(poly, p)
    case (pa: Poly, pb: Poly) =>
      pa.ring.forall(p => contains(pb, p) || onBoundary(pb, p))
    case _ => throw new IllegalArgumentException("unsupported within pair")
  }

  // ---- Column API (st_* functions) ----

  val stDistance: (Column, Column) => Column = {
    val f = udf((w1: String, w2: String) => distance(parseWkt(w1), parseWkt(w2)))
    (c1, c2) => f(c1, c2)
  }

  val stArea: Column => Column = {
    val f = udf((w: String) => area(parseWkt(w)))
    c => f(c)
  }

  val stIntersects: (Column, Column) => Column = {
    val f = udf((w1: String, w2: String) => intersects(parseWkt(w1), parseWkt(w2)))
    (c1, c2) => f(c1, c2)
  }

  val stDisjoint: (Column, Column) => Column =
    (c1, c2) => !stIntersects(c1, c2)

  val stWithin: (Column, Column) => Column = {
    val f = udf((w1: String, w2: String) => within(parseWkt(w1), parseWkt(w2)))
    (c1, c2) => f(c1, c2)
  }

  val stContains: (Column, Column) => Column =
    (c1, c2) => stWithin(c2, c1)

  val stEquals: (Column, Column) => Column = {
    val f = udf((w1: String, w2: String) => parseWkt(w1) == parseWkt(w2))
    (c1, c2) => f(c1, c2)
  }

  val stAsBinary: Column => Column = {
    val f = udf((w: String) => toWkb(parseWkt(w)))
    c => f(c)
  }

  val stGeomFromWkb: Column => Column = {
    val f = udf((b: Array[Byte]) => toWkt(fromWkb(b)))
    c => f(c)
  }
}
