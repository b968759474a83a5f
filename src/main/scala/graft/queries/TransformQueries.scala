package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.GeoFns

/** §A++ transform-function breadth — Pinot's string / math / geospatial
  * scalar function families, all codegen'd column expressions.
  */
object TransformQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_string_fns",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            lpad(col("p_brand"), 10, "#").as("brand_pad"),
            regexp_replace(col("p_name"), " ", "_").as("name_us"),
            reverse(col("p_type")).as("type_rev"),
            instr(col("p_name"), "e").as("e_pos"),
            lower(col("p_type")).as("type_lc"),
            trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"))
          .orderBy("p_partkey")
          .limit(300),
      Some("""SELECT p_partkey, lpad(p_brand, 10, '#') AS brand_pad,
                     replace(p_name, ' ', '_') AS name_us,
                     reverse(p_type) AS type_rev,
                     CAST(strpos(p_name, 'e') AS INT) AS e_pos,
                     lower(p_type) AS type_lc,
                     trim('  ' || p_brand || '  ') AS brand_trim
              FROM part ORDER BY p_partkey LIMIT 300""")),

    QueryDef(
      "q_math_fns",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") <= 100)
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_partkey"), col("l_suppkey"), col("l_extendedprice"),
            round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
            round(exp(col("l_discount")), 4).as("exp_disc"),
            round(log(col("l_extendedprice")), 4).as("ln_price"),
            round(log10(col("l_extendedprice")), 4).as("log10_price"),
            round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
            (col("l_partkey") % 7).as("pk_mod7"),
            signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
            ceil(col("l_quantity")).as("qty_ceil"),
            floor(col("l_extendedprice")).as("price_floor"))
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_partkey", "l_suppkey",
            "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_partkey, l_suppkey,
                     l_extendedprice,
                     round(sqrt(l_extendedprice), 4) AS sqrt_price,
                     round(exp(l_discount), 4) AS exp_disc,
                     round(ln(l_extendedprice), 4) AS ln_price,
                     round(log10(l_extendedprice), 4) AS log10_price,
                     round(pow(l_quantity, 2), 2) AS qty_sq,
                     l_partkey % 7 AS pk_mod7,
                     CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
                     CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
                     CAST(floor(l_extendedprice) AS BIGINT) AS price_floor
              FROM lineitem
              WHERE l_orderkey <= 100
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_partkey, l_suppkey,
                       l_extendedprice""")),

    // Hash / binary transform family (BYTES columns, sketch-adjacent
    // hashing: md5 / sha256 / hex / base64).
    QueryDef(
      "q_hash_fns",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            md5(col("p_name")).as("name_md5"),
            sha2(col("p_name"), 256).as("name_sha256"),
            hex(col("p_name")).as("name_hex"),
            base64(col("p_name").cast("binary")).as("name_b64"))
          .orderBy("p_partkey")
          .limit(400),
      Some("""SELECT p_partkey, md5(p_name) AS name_md5,
                     sha256(p_name) AS name_sha256,
                     hex(p_name) AS name_hex,
                     to_base64(encode(p_name)) AS name_b64
              FROM part ORDER BY p_partkey LIMIT 400""")),

    // ST_Distance / within-radius analog on synthetic coordinates derived
    // deterministically from the customer key (both engines derive them
    // with the same arithmetic).
    QueryDef(
      "q_geo_distance",
      (s, d) => {
        val c = Tables.customer(s, d)
          .withColumn("lat", (col("c_custkey") % 180) - 90 + lit(0.5))
          .withColumn("lon", ((col("c_custkey") * 7) % 360) - 180 + lit(0.5))
        c.withColumn("dist_km",
            GeoFns.haversineKm(col("lat"), col("lon"), lit(48.9), lit(2.4)))
          .filter(col("dist_km") <= 8000.0)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"), round(avg("dist_km"), 2).as("avg_dist"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH pts AS (SELECT c_mktsegment,
                     (c_custkey % 180) - 90 + 0.5 AS lat,
                     ((c_custkey * 7) % 360) - 180 + 0.5 AS lon
                     FROM customer),
                   dists AS (SELECT c_mktsegment,
                     2 * 6371.0088 * asin(sqrt(
                       pow(sin(radians(48.9 - lat) / 2), 2) +
                       cos(radians(lat)) * cos(radians(48.9)) *
                       pow(sin(radians(2.4 - lon) / 2), 2))) AS dist_km
                     FROM pts)
              SELECT c_mktsegment, count(*) AS cnt, round(avg(dist_km), 2) AS avg_dist
              FROM dists WHERE dist_km <= 8000.0
              GROUP BY 1 ORDER BY c_mktsegment"""))
  )
}
