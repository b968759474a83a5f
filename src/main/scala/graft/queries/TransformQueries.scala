package graft.queries

import org.apache.spark.sql.expressions.Window
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

    // URL transform family (Pinot URL functions): host/path/query-param
    // extraction plus encode/decode round-trip, over URLs synthesized
    // deterministically so both engines parse identical strings.
    QueryDef(
      "q_url_fns",
      (s, d) => {
        val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id"), lit("?lang="), col("lang"), lit("&page=2"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            parse_url(url, lit("HOST")).as("host"),
            parse_url(url, lit("PATH")).as("path"),
            parse_url(url, lit("QUERY"), lit("lang")).as("q_lang"),
            url_encode(concat(col("lang"), lit(" & "), col("source"))).as("enc"),
            url_decode(url_encode(col("source"))).as("dec_roundtrip"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (SELECT doc_id, lang, source,
                     'https://' || source || '.example.com/docs/' || doc_id ||
                     '?lang=' || lang || '&page=2' AS url
              FROM documents)
              SELECT doc_id,
                     regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                     regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
                     regexp_extract(url, 'lang=([^&]*)', 1) AS q_lang,
                     replace(replace(lang || ' & ' || source, '&', '%26'), ' ', '+') AS enc,
                     source AS dec_roundtrip
              FROM u ORDER BY doc_id""")),

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
              GROUP BY 1 ORDER BY c_mktsegment""")),

    // GEO kNN — the "3 nearest depots per customer" logistics question:
    // the bounded query set probes the broadcast supplier DICTIONARY
    // (suppliers are a dimension — the q_knn_brute economics with
    // haversine instead of cosine), ranked (distance, suppkey) so ties
    // are total-ordered on both engines. At corpus-scale query sets the
    // same plan swaps the window for the bounded top-k heap and the
    // probe for the grid-cell equi-join (q_geo_join's layout).
    QueryDef(
      "q_geo_knn",
      (s, d) => {
        val q = Tables.customer(s, d)
          .filter(col("c_custkey") < 30)
          .withColumn("lat", (col("c_custkey") % 180) - 90 + lit(0.5))
          .withColumn("lon", ((col("c_custkey") * 7) % 360) - 180 + lit(0.5))
          .select(col("c_custkey"), col("lat"), col("lon"))
        val sup = Tables.supplier(s, d)
          .withColumn("s_lat", ((col("s_suppkey") * 13) % 180) - 90 + lit(0.5))
          .withColumn("s_lon", ((col("s_suppkey") * 29) % 360) - 180 + lit(0.5))
          .select(col("s_suppkey"), col("s_lat"), col("s_lon"))
        val w = Window.partitionBy("c_custkey")
          .orderBy(asc("dist_km"), asc("s_suppkey"))
        q.crossJoin(broadcast(sup))
          .withColumn("dist_km",
            GeoFns.haversineKm(col("lat"), col("lon"), col("s_lat"), col("s_lon")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("c_custkey"), col("rank"), col("s_suppkey"),
            round(col("dist_km"), 2).as("dist_km"))
          .orderBy("c_custkey", "rank")
      },
      Some("""WITH q AS (SELECT c_custkey,
                                (c_custkey % 180) - 90 + 0.5 AS lat,
                                ((c_custkey * 7) % 360) - 180 + 0.5 AS lon
                         FROM customer WHERE c_custkey < 30),
                   s AS (SELECT s_suppkey,
                                ((s_suppkey * 13) % 180) - 90 + 0.5 AS s_lat,
                                ((s_suppkey * 29) % 360) - 180 + 0.5 AS s_lon
                         FROM supplier),
                   dd AS (SELECT q.c_custkey, s.s_suppkey,
                                 2 * 6371.0088 * asin(sqrt(
                                   pow(sin(radians(s_lat - lat) / 2), 2) +
                                   cos(radians(lat)) * cos(radians(s_lat)) *
                                   pow(sin(radians(s_lon - lon) / 2), 2))) AS dist_km
                          FROM q, s),
                   r AS (SELECT c_custkey, s_suppkey, dist_km,
                                row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY dist_km, s_suppkey) AS rank
                         FROM dd)
              SELECT c_custkey, CAST(rank AS INT) AS rank, s_suppkey,
                     round(dist_km, 2) AS dist_km
              FROM r WHERE rank <= 3 ORDER BY c_custkey, rank""")),

    // Geospatial RADIUS JOIN via grid-cell bucketing (geohash-analog):
    // customers land in one 10°-cell; each supplier probes its 3x3
    // neighborhood — an EQUI-join on the cell id, then exact haversine
    // refines. Never a cross join: at 100 TB the join fan-out is bounded
    // by cell occupancy, the geospatial-index shape. The working region
    // is restricted to |lat|<=60, lon in [-170,170] so a 10° cell
    // provably covers the 500 km radius (lon shrink factor cos(60°)=0.5;
    // no antimeridian wrap) — the oracle cross-joins and must agree
    // exactly.
    QueryDef(
      "q_geo_join",
      (s, d) => {
        val cell = 10.0
        val cust = Tables.customer(s, d)
          .withColumn("lat", (col("c_custkey") % 180) - 90 + lit(0.5))
          .withColumn("lon", ((col("c_custkey") * 7) % 360) - 180 + lit(0.5))
          .filter(col("lat").between(-60, 60) && col("lon").between(-170, 170))
          .withColumn("cell", GeoFns.gridCell(col("lat"), col("lon"), cell))
          .select(col("c_custkey"), col("lat").as("c_lat"), col("lon").as("c_lon"), col("cell"))
        val supp = Tables.supplier(s, d)
          .withColumn("lat", ((col("s_suppkey") * 13) % 180) - 90 + lit(0.5))
          .withColumn("lon", ((col("s_suppkey") * 29) % 360) - 180 + lit(0.5))
          .filter(col("lat").between(-60, 60) && col("lon").between(-170, 170))
          .select(col("s_suppkey"), col("lat").as("s_lat"), col("lon").as("s_lon"),
            explode(GeoFns.neighborCells(col("lat"), col("lon"), cell)).as("cell"))
        broadcast(supp).join(cust, Seq("cell"))
          .withColumn("dist_km",
            GeoFns.haversineKm(col("s_lat"), col("s_lon"), col("c_lat"), col("c_lon")))
          .filter(col("dist_km") <= 500.0)
          .groupBy("s_suppkey")
          .agg(count(lit(1)).as("cnt"), round(min("dist_km"), 2).as("min_dist"))
          .orderBy("s_suppkey")
      },
      Some("""WITH cust AS (SELECT c_custkey,
                     (c_custkey % 180) - 90 + 0.5 AS lat,
                     ((c_custkey * 7) % 360) - 180 + 0.5 AS lon
                   FROM customer),
                   cf AS (SELECT * FROM cust
                          WHERE lat BETWEEN -60 AND 60 AND lon BETWEEN -170 AND 170),
                   supp AS (SELECT s_suppkey,
                     ((s_suppkey * 13) % 180) - 90 + 0.5 AS lat,
                     ((s_suppkey * 29) % 360) - 180 + 0.5 AS lon
                   FROM supplier),
                   sf AS (SELECT * FROM supp
                          WHERE lat BETWEEN -60 AND 60 AND lon BETWEEN -170 AND 170),
                   pairs AS (SELECT s_suppkey,
                     2 * 6371.0088 * asin(sqrt(
                       pow(sin(radians(c.lat - s.lat) / 2), 2) +
                       cos(radians(s.lat)) * cos(radians(c.lat)) *
                       pow(sin(radians(c.lon - s.lon) / 2), 2))) AS dist_km
                     FROM sf s CROSS JOIN cf c)
              SELECT s_suppkey, count(*) AS cnt, round(min(dist_km), 2) AS min_dist
              FROM pairs WHERE dist_km <= 500.0
              GROUP BY 1 ORDER BY s_suppkey""")),

    // REGEXP_EXTRACT transform family (Pinot regexpExtract /
    // regexpExtractAll — text-search-support.md lists regex as a core
    // text capability; the transform form is a scan-local codegen'd
    // expression in both engines).
    QueryDef(
      "q_regexp_extract",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("src_num"),
            regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"),
            size(split(col("text"), "\\bdata\\b")).minus(1).as("n_data"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS src_num,
                     regexp_extract(text, '^(\w+)', 1) AS first_word,
                     CAST(len(regexp_split_to_array(text, '\bdata\b')) - 1 AS INT) AS n_data
              FROM documents ORDER BY doc_id""")),

    // Grid-cell density aggregation — the geo-index aggregation shape
    // (geohash/H3 bucket counts): cells are the same packed
    // (latIdx << 32 | lonIdx) ids the radius join probes, so the index
    // layer and the aggregation layer share one bucketing.
    QueryDef(
      "q_geo_grid_agg",
      (s, d) => {
        val cell = 10.0
        Tables.customer(s, d)
          .withColumn("lat", (col("c_custkey") % 180) - 90 + lit(0.5))
          .withColumn("lon", ((col("c_custkey") * 7) % 360) - 180 + lit(0.5))
          .withColumn("cell", GeoFns.gridCell(col("lat"), col("lon"), cell))
          .groupBy("cell")
          .agg(count(lit(1)).as("cnt"),
            round(avg("lat"), 4).as("avg_lat"), round(avg("lon"), 4).as("avg_lon"))
          .filter(col("cnt") >= 2)
          .orderBy("cell")
      },
      Some("""WITH pts AS (SELECT
                     (c_custkey % 180) - 90 + 0.5 AS lat,
                     ((c_custkey * 7) % 360) - 180 + 0.5 AS lon
                   FROM customer)
              SELECT CAST(floor((lat + 90) / 10) AS BIGINT) * 4294967296
                       + CAST(floor((lon + 180) / 10) AS BIGINT) AS cell,
                     count(*) AS cnt,
                     round(avg(lat), 4) AS avg_lat, round(avg(lon), 4) AS avg_lon
              FROM pts GROUP BY 1 HAVING count(*) >= 2 ORDER BY cell""")),

    // URL canonicalization before URL-level dedup (functions.UrlFns):
    // crawl variants of one page (case-shifted host, default :443 port,
    // www. prefix, utm_* tracking params, fragments, slash-before-query)
    // collapse to one canonical form, so groupBy(canon) actually merges
    // them — every doc_id-distinct raw URL lands on its (source, lang)
    // canonical. All codegen'd string/regexp steps, replayed one-for-one
    // in the oracle.
    QueryDef(
      "q_url_canonical",
      (s, d) => {
        val raw = concat(
          lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/"),
          col("lang"), lit("/index.html/?utm_source="), col("doc_id"),
          lit("&ref="), col("lang"),
          when(col("doc_id") % 2 === 0, concat(lit("#sec"), col("doc_id")))
            .otherwise(lit("")))
        Tables.documents(s, d)
          .select(col("doc_id"), raw.as("url"))
          .select(col("url"), graft.functions.UrlFns.canonicalize(col("url")).as("canon"))
          .groupBy("canon")
          .agg(count(lit(1)).as("cnt"), countDistinct(col("url")).as("n_raw"))
          .orderBy("canon")
      },
      Some("""WITH raw AS (SELECT doc_id,
                     'HTTPS://WWW.' || source || '.Example.COM:443/' || lang ||
                     '/index.html/?utm_source=' || doc_id || '&ref=' || lang ||
                     CASE WHEN doc_id % 2 = 0 THEN '#sec' || doc_id ELSE '' END AS url
                   FROM documents),
                   c1 AS (SELECT url, regexp_replace(url, '#.*', '') AS u FROM raw),
                   c2 AS (SELECT url, u,
                            regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*') AS p
                          FROM c1),
                   c3 AS (SELECT url, p,
                            regexp_extract(substr(u, len(p) + 1, len(u)), '^[^?#]*') AS pth,
                            substr(u, len(p) + 1, len(u)) AS rest
                          FROM c2),
                   c4 AS (SELECT url, p, pth,
                            regexp_replace(
                              regexp_replace(substr(rest, len(pth) + 1, len(rest)),
                                             '[?&]utm_[^&#]*', '', 'g'),
                              '^&', '?') AS q
                          FROM c3),
                   c5 AS (SELECT url,
                            replace(regexp_replace(lower(p), ':443$', ''),
                                    '://www.', '://')
                            || CASE WHEN len(pth) > 1
                                    THEN regexp_replace(pth, '/$', '') ELSE pth END
                            || q AS canon
                          FROM c4)
              SELECT canon, count(*) AS cnt,
                     CAST(count(DISTINCT url) AS BIGINT) AS n_raw
              FROM c5 GROUP BY 1 ORDER BY canon""")),

    // ST_Contains(polygon, point) — even-odd ray casting against a fixed
    // geofence. The polygon unrolls into one codegen'd comparison chain
    // per edge (scan-local, no join); the oracle SQL is GENERATED from
    // the same vertex list so the two sides cannot drift. Vertices use
    // .1/.3-grade decimals while the synthetic points sit on .5 offsets,
    // so no point is near-degenerate with an edge.
    QueryDef(
      "q_geo_polygon",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .withColumn("lat", (col("c_custkey") % 180) - 90 + lit(0.5))
          .withColumn("lon", ((col("c_custkey") * 7) % 360) - 180 + lit(0.5))
        cust
          .withColumn("inside",
            GeoFns.pointInPolygon(col("lat"), col("lon"), GeoPolygon.vertices))
          .groupBy("c_mktsegment")
          .agg(
            sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside"),
            count(lit(1)).as("n_total"))
          .orderBy("c_mktsegment")
      },
      Some(s"""WITH pts AS (SELECT c_mktsegment,
                     (c_custkey % 180) - 90 + 0.5 AS lat,
                     ((c_custkey * 7) % 360) - 180 + 0.5 AS lon
                   FROM customer),
                   flagged AS (SELECT c_mktsegment,
                     (${GeoPolygon.boundsSql} AND (${GeoPolygon.crossingsSql}) % 2 = 1) AS inside
                   FROM pts)
              SELECT c_mktsegment,
                     CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
                     CAST(count(*) AS BIGINT) AS n_total
              FROM flagged GROUP BY 1 ORDER BY c_mktsegment"""))
  )
}

/** The fixed test geofence shared by the Spark expression and the DuckDB
  * oracle — the oracle's ray-cast SQL is generated from these vertices so
  * both engines evaluate the identical arithmetic.
  */
private[queries] object GeoPolygon {
  val vertices: Seq[(Double, Double)] = Seq(
    (35.2, -10.1), (60.3, -5.2), (65.1, 20.3), (48.7, 35.4), (36.6, 22.8))

  def boundsSql: String = {
    val lats = vertices.map(_._1); val lons = vertices.map(_._2)
    s"lat BETWEEN ${lats.min} AND ${lats.max} AND lon BETWEEN ${lons.min} AND ${lons.max}"
  }

  /** One ray-crossing CASE term per polygon edge — the same even-odd test
    * GeoFns.pointInPolygon folds into the Spark plan.
    */
  def crossingsSql: String =
    vertices.zip(vertices.tail :+ vertices.head).map {
      case ((latI, lonI), (latJ, lonJ)) =>
        s"""CASE WHEN (($latI > lat) <> ($latJ > lat))
            AND lon < (${lonJ - lonI}) * (lat - $latI) / (${latJ - latI}) + $lonI
            THEN 1 ELSE 0 END"""
    }.mkString(" + ")
}
