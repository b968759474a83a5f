package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFns

/** Randomized cross-check of the codegen'd point-in-polygon expression
  * against a plain-Scala even-odd reference: the folded Column arithmetic
  * must agree with the direct implementation for arbitrary star-shaped
  * simple polygons and arbitrary points (seeded, deterministic). Points
  * exactly on an edge are measure-zero under continuous sampling.
  */
class GeoSpec extends SparkSpec {

  private def referenceInside(
      lat: Double, lon: Double, poly: Seq[(Double, Double)]): Boolean = {
    val lats = poly.map(_._1); val lons = poly.map(_._2)
    if (lat < lats.min || lat > lats.max || lon < lons.min || lon > lons.max)
      return false
    var crossings = 0
    poly.zip(poly.tail :+ poly.head).foreach { case ((latI, lonI), (latJ, lonJ)) =>
      if (latJ != latI &&
        ((latI > lat) != (latJ > lat)) &&
        lon < (lonJ - lonI) * (lat - latI) / (latJ - latI) + lonI)
        crossings += 1
    }
    crossings % 2 == 1
  }

  test("pointInPolygon matches the plain even-odd reference on random polygons") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      // star-shaped simple polygon: sorted angles + random radii around a center
      val nV = 3 + rnd.nextInt(7)
      val cLat = rnd.nextDouble() * 100 - 50
      val cLon = rnd.nextDouble() * 200 - 100
      val angles = Seq.fill(nV)(rnd.nextDouble() * 2 * math.Pi).sorted
      // degenerate (duplicate-angle) vertices would self-intersect; nudge
      val poly = angles.zipWithIndex.map { case (a, i) =>
        val r = 5 + rnd.nextDouble() * 25
        (cLat + r * math.sin(a + i * 1e-9), cLon + r * math.cos(a + i * 1e-9))
      }
      val pts = Seq.fill(300)(
        (cLat + rnd.nextDouble() * 80 - 40, cLon + rnd.nextDouble() * 80 - 40))
      val got = pts.toDF("lat", "lon")
        .select(col("lat"), col("lon"),
          GeoFns.pointInPolygon(col("lat"), col("lon"), poly).as("inside"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
      pts.foreach { case (la, lo) =>
        assert(got((la, lo)) === referenceInside(la, lo, poly),
          s"disagree at ($la, $lo) for polygon $poly")
      }
    }
  }
}
