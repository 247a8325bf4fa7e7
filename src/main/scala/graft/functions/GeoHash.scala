package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash family (reference `functions/geohash/`, GEOBYTE..GEOLONG types
  * with 1-60 bit precision, prefix `within` — SURVEY §1.2, §2.8).
  *
  * Closed-form lowering: quantize lat/lon to 30-bit ints, interleave
  * (lon first) to a ≤60-bit value, emit base32 chars. Everything is
  * integer shift/mask arithmetic generated as SQL text by [[bitSql]] —
  * the SAME generator emits the DuckDB oracle expression, so encode is
  * verified bit-for-bit. No UDF: stays inside codegen.
  */
object GeoHash {
  val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Dialect-neutral SQL for the geohash of (latCol, lonCol). */
  def encodeSql(latCol: String, lonCol: String, chars: Int, forDuck: Boolean = false): String = {
    require(chars >= 1 && chars <= 12)
    val lonInt = s"least(CAST(floor(($lonCol + 180.0) / 360.0 * 1073741824.0) AS BIGINT), 1073741823)"
    val latInt = s"least(CAST(floor(($latCol + 90.0) / 180.0 * 1073741824.0) AS BIGINT), 1073741823)"
    def shr(x: String, n: Int) = if (forDuck) s"($x >> $n)" else s"shiftright($x, $n)"
    def shl(x: String, n: Int) = if (forDuck) s"($x << $n)" else s"shiftleft($x, $n)"
    def bit(k: Int): String =
      if (k % 2 == 0) s"(${shr("__ghlon", 29 - k / 2)} & 1)"
      else s"(${shr("__ghlat", 29 - (k - 1) / 2)} & 1)"
    val charExprs = (0 until chars).map { c =>
      val digit = (0 to 4).map(j => shl(bit(5 * c + j), 4 - j)).mkString(" + ")
      val pos = s"CAST($digit AS INT) + 1"
      s"substring('$Base32', $pos, 1)"
    }
    val body = charExprs.mkString("concat(", ", ", ")")
    // inline the quantized ints (no lateral aliases → portable)
    body.replace("__ghlon", s"($lonInt)").replace("__ghlat", s"($latInt)")
  }

  /** Spark Column: geohash of two double columns. */
  def encode(latCol: String, lonCol: String, chars: Int): Column =
    expr(encodeSql(latCol, lonCol, chars))

  /** `within` — geohash prefix containment (reference `within` operator
    * over geohash literals like #sp052w).
    */
  def within(geohash: Column, prefix: String): Column =
    geohash.startsWith(prefix.stripPrefix("#"))

  /** Truncate precision = string prefix (geohash property). */
  def truncate(geohash: Column, chars: Int): Column =
    substring(geohash, 1, chars)

  /** Haversine distance in meters between two lat/lon pairs (reference
    * `geo_distance_meters`). Pure double arithmetic — same shape on any
    * engine.
    */
  def distanceMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val R = 6371008.8 // mean earth radius (m)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * R) * asin(sqrt(a))
  }
}
