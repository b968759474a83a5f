package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial functions — Pinot ships a Geospatial index + ST_* function
  * family (reference: /root/reference/basics/indexing/README.md:22).
  * Spark-native: great-circle math as codegen'd column expressions; at
  * scale, radius queries ride on a bounding-box pre-filter (cheap lat/lon
  * range predicates that DO push down to parquet) before the exact
  * haversine.
  */
object GeoFns {

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two (lat, lon) degree pairs —
    * ST_Distance analog.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** ST_Within-circle analog with a sargable bounding-box pre-filter:
    * the box predicate prunes row groups; haversine refines.
    */
  def withinRadiusKm(
      lat: Column, lon: Column,
      centerLat: Double, centerLon: Double, radiusKm: Double): Column = {
    val latDelta = math.toDegrees(radiusKm / EarthRadiusKm)
    val lonDelta = math.toDegrees(
      radiusKm / (EarthRadiusKm * math.max(math.cos(math.toRadians(centerLat)), 1e-9)))
    lat.between(centerLat - latDelta, centerLat + latDelta) &&
      lon.between(centerLon - lonDelta, centerLon + lonDelta) &&
      haversineKm(lat, lon, lit(centerLat), lit(centerLon)) <= radiusKm
  }
}
