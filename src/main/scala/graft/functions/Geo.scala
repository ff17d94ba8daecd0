package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions (SURVEY §2.9 F2–F4, §2.10 support).
  *
  * All are composed from built-in codegen'd expressions — no UDFs — so they stay
  * inside WholeStageCodegen and parquet pushdown keeps working around them.
  *
  * Reference: `inbounds` `/root/reference/thisishappening/utils/data_utils.py:43-46`
  * (closed bbox on both edges); haversine is the distance DBSCAN uses
  * (`cluster_utils.py:24-42`, sklearn haversine on radians × earth radius).
  */
object Geo {

  /** Mean Earth radius (km), matching sklearn/reference usage
    * (`cluster_utils.py:30`: 6371.0088).
    */
  val EarthRadiusKm = 6371.0088

  /** Point-in-bbox, closed on all edges (`data_utils.py:43-46`). */
  def inbounds(lon: Column, lat: Column, west: Double, south: Double, east: Double, north: Double): Column =
    lon >= west && lon <= east && lat >= south && lat <= north

  /** Great-circle distance in km between two lon/lat (degrees) points.
    * 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))).
    */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Bbox min/max unpack (`data_utils.py:49-54`) for an
    * `array<double>` [west, south, east, north] column.
    */
  def bboxWest(b: Column): Column  = b.getItem(0)
  def bboxSouth(b: Column): Column = b.getItem(1)
  def bboxEast(b: Column): Column  = b.getItem(2)
  def bboxNorth(b: Column): Column = b.getItem(3)

  /** Haversine height/width of a bbox in km (`data_utils.py:57-61`; the
    * reference uses WGS-84 geodesic — haversine differs by ≲0.3%, documented
    * per SURVEY §7.4.9; grid-dimension fixtures pin the delta).
    */
  def bboxDimsKm(west: Column, south: Column, east: Column, north: Column): (Column, Column) = {
    val height = haversineKm(west, south, west, north)
    val width  = haversineKm(west, south, east, south)
    (height, width)
  }
}
