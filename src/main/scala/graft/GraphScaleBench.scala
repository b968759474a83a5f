package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-topology scale evidence for the two web-scale graph paths
  * (the r13 verdict's ask): the registry's host-graph fixture has small
  * diameter and bounded degree, so its 100× slopes never stress the
  * properties these algorithms exist for. This main measures them on the
  * topologies that BREAK their naive siblings:
  *
  *   - PATH graph (diameter = n-1) at 1× and 100×:
  *     `ConnectedComponents.componentsStar` must converge in O(log² n)
  *     rounds independent of diameter — hash-to-min would pay O(n) rounds
  *     (2·10⁶ rounds at the 100× size; not runnable, which is the point).
  *     Reported: wall time, ROUND COUNT (the claim is about rounds), and
  *     a correctness scalar (one component spanning all nodes).
  *
  *   - HUB graph (one vertex of degree n-1, plus a leaf path that closes
  *     n-2 triangles through the hub) at 1× and 100×:
  *     `Triangles.perNodeDegreeOrdered` orients every edge INTO the hub,
  *     so wedges generate at the degree-≤3 corners: Σ outdeg² stays O(n)
  *     where an id-order orientation with the hub sorted low fans out
  *     C(n-1, 2) ≈ 2·10¹² wedges at 100× (not runnable either).
  *     Reported: wall time, Σ outdeg² under the orientation actually used
  *     (the fan-out bound, measured not argued), and the exact expected
  *     triangle count as the correctness scalar.
  *
  * Usage: runMain graft.GraphScaleBench [n1] [copies]  (default 20000 100)
  * Prints one JSON line per (fixture, scale) plus a summary line per
  * fixture; builder-run, results land in SCALE100_r{N}.json.
  */
object GraphScaleBench {

  private def pad(c: org.apache.spark.sql.Column) = format_string("n%09d", c)

  /** Path 0-1-2-…-(n-1): the worst case for label-propagation rounds. */
  private def pathEdges(spark: SparkSession, n: Long): DataFrame =
    spark.range(n - 1).select(pad(col("id")).as("src"), pad(col("id") + 1).as("dst"))

  /** Hub 0 linked to every leaf 1..n-1; consecutive leaves linked, so
    * (hub, i, i+1) closes n-2 triangles. Canonical (a < b) undirected
    * form, the perNodeDegreeOrdered input contract.
    */
  private def hubEdges(spark: SparkSession, n: Long): DataFrame = {
    val star = spark.range(1, n)
      .select(pad(lit(0)).as("a"), pad(col("id")).as("b"))
    val path = spark.range(1, n - 1)
      .select(pad(col("id")).as("a"), pad(col("id") + 1).as("b"))
    star.unionByName(path)
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def f3(v: Double): String = "%.3f".format(v)

  def main(args: Array[String]): Unit = {
    val n1 = args.headOption.map(_.toLong).getOrElse(20000L)
    val copies = args.drop(1).headOption.map(_.toLong).getOrElse(100L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-graph-scale", extraConf = Map("spark.ui.enabled" -> "false"))

    // warm the join/agg code paths once so the 1× point isn't JIT-charged
    graft.graph.ConnectedComponents.componentsStar(pathEdges(spark, 256)).count()
    graft.graph.Triangles.perNodeDegreeOrdered(hubEdges(spark, 256)).count()

    def ccTimedPoint(n: Long): (Double, Int) = {
      var rounds = 0
      val (_, t) = timed {
        val (labels, r) =
          graft.graph.ConnectedComponents.componentsStarWithRounds(pathEdges(spark, n))
        rounds = r
        val s = labels.agg(countDistinct("comp"), count(lit(1))).head()
        require(s.getLong(0) == 1L && s.getLong(1) == n,
          s"path CC wrong at n=$n: $s")
      }
      println(s"""{"metric":"graph_scale","fixture":"path","engine":"cc_star","n":$n,"rounds":$rounds,"sec":${f3(t)},"one_component":true}""")
      (t, rounds)
    }

    def triPoint(n: Long): (Double, Long) = {
      val ue = hubEdges(spark, n)
      // the fan-out bound actually realized by the orientation: oriented
      // out-degrees, Σ outdeg² (cheap aggregate, measured evidence for
      // the O(m^1.5)-under-any-skew claim)
      val deg = ue.select(col("a").as("node")).union(ue.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val da = deg.select(col("node").as("a"), col("deg").as("da"))
      val db = deg.select(col("node").as("b"), col("deg").as("db"))
      val aFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val sumOut2 = ue.join(da, Seq("a")).join(db, Seq("b"))
        .select(when(aFirst, col("a")).otherwise(col("b")).as("src"))
        .groupBy("src").agg(count(lit(1)).as("od"))
        .agg(sum(col("od") * col("od"))).head().getLong(0)
      var total = -1L
      val (_, t) = timed {
        val perNode = graft.graph.Triangles.perNodeDegreeOrdered(ue)
        total = perNode.agg(sum("n_triangles")).head().getLong(0) / 3L
        require(total == n - 2,
          s"hub triangles wrong at n=$n: $total != ${n - 2}")
      }
      println(s"""{"metric":"graph_scale","fixture":"hub","engine":"triangles_ordered","n":$n,"sec":${f3(t)},"sum_outdeg2":$sumOut2,"triangles":$total}""")
      (t, sumOut2)
    }

    val (t1c, r1) = ccTimedPoint(n1)
    val (tCc, rC) = ccTimedPoint(n1 * copies)
    println(s"""{"metric":"graph_scale_summary","fixture":"path","engine":"cc_star","copies":$copies,"t_1x":${f3(t1c)},"t_Cx":${f3(tCc)},"slope":${f3(tCc / math.max(t1c, 1e-9))},"rounds_1x":$r1,"rounds_Cx":$rC}""")

    val (t1t, s1) = triPoint(n1)
    val (tCt, sC) = triPoint(n1 * copies)
    println(s"""{"metric":"graph_scale_summary","fixture":"hub","engine":"triangles_ordered","copies":$copies,"t_1x":${f3(t1t)},"t_Cx":${f3(tCt)},"slope":${f3(tCt / math.max(t1t, 1e-9))},"sum_outdeg2_1x":$s1,"sum_outdeg2_Cx":$sC}""")

    // HITS on the hub fixture (extreme in/out-degree skew: the hub's
    // authority row aggregates n-1 contributions in one group) — the
    // fixpoint is per-iteration join+agg work, so the slope should track
    // edge count ≈ copies; correctness scalar: both scores stay
    // L1-normalized and every node is scored.
    def hitsPoint(n: Long): Double = {
      val e = hubEdges(spark, n).select(
        col("a").as("src"), col("b").as("dst"), lit(1.0).as("weight"))
      val (_, t) = timed {
        val ha = graft.graph.Hits.hubsAndAuthorities(e, iterations = 2)
        val s = ha.agg(sum("auth"), sum("hub"), count(lit(1))).head()
        require(math.abs(s.getDouble(0) - 1.0) < 1e-6 &&
          math.abs(s.getDouble(1) - 1.0) < 1e-6 && s.getLong(2) == n,
          s"HITS norms/cardinality wrong at n=$n: $s")
      }
      println(s"""{"metric":"graph_scale","fixture":"hub","engine":"hits","n":$n,"sec":${f3(t)},"l1_normalized":true}""")
      t
    }
    graft.graph.Hits.hubsAndAuthorities(
      hubEdges(spark, 256).select(col("a").as("src"), col("b").as("dst"),
        lit(1.0).as("weight")), iterations = 2).count() // JIT warm-up
    val t1h = hitsPoint(n1)
    val tCh = hitsPoint(n1 * copies)
    println(s"""{"metric":"graph_scale_summary","fixture":"hub","engine":"hits","copies":$copies,"t_1x":${f3(t1h)},"t_Cx":${f3(tCh)},"slope":${f3(tCh / math.max(t1h, 1e-9))}}""")
    spark.stop()
  }
}
