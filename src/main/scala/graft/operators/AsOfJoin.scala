package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for every left row, the latest right row with
  * `right.ts <= left.ts` on the same key (event attribution, price-as-of,
  * upsert-state-at-time queries). Spark has no native ASOF operator;
  * the common workaround — a non-equi range join + per-left-row argmax —
  * explodes to one row per (left, earlier-right) pair before reducing.
  *
  * This implementation composes existing operators into the scale shape:
  * tag both sides, UNION them, and carry the latest right payload forward
  * with `last(ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side)`.
  * One hash shuffle on the key + one partition-local sort, state O(1) per
  * row — the same cost as a single window aggregate, independent of how
  * many right rows precede each left row. Ties (left.ts == right.ts)
  * match, the right row sorting first; multiple right rows on the same
  * (key, ts) resolve DETERMINISTICALLY to the lexicographically greatest
  * payload struct (the payload is the window sort's final tiebreaker —
  * Spark's window-sort pick would otherwise be partitioning-dependent,
  * a latent hash-flake). Payload columns must therefore be orderable
  * types; an oracle replays the same rule as a per-(key, ts) argmax.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns delivered onto each left row
    *                    (null when no right row precedes the left row).
    */
  /** The payload struct joins the (key, ts) tie-break SORT key, so every
    * payload column must be orderable — validated up front with a named
    * column in the error, instead of letting an unorderable type (e.g.
    * MapType) surface as a generic analyzer exception deep in the window
    * sort.
    */
  private def requireOrderablePayload(
      right: DataFrame, payloadCols: Seq[String]): Unit =
    payloadCols.foreach { c =>
      val dt = right.select(col(c)).schema.head.dataType
      require(
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"as-of payload column '$c' has unorderable type ${dt.simpleString}; " +
          "payload columns join the deterministic (key, ts) tie-break sort " +
          "key — drop it from payloadCols or cast it to an orderable type")
    }

  def asof(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    requireOrderablePayload(right, payloadCols)
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftRow = struct(left.columns.map(col).toSeq: _*)
    val leftType = left.select(leftRow).schema.head.dataType

    val r = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__ts"),
      payload.as("__p"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"))
    val l = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__ts"),
      lit(null).cast(payloadType).as("__p"), lit(1).as("__side"),
      leftRow.as("__l"))

    // __p asc as the last sort key: among right rows tied on (key, ts),
    // last(ignoreNulls) then carries the GREATEST payload — deterministic
    // under any partitioning, and replayable by an oracle-side argmax
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c)).toSeq
    val rightCols = payloadCols.map(c => col(s"__carry.$c").as(c))
    carried.select(leftCols ++ rightCols: _*)
  }

  /** FORWARD as-of: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` on the same key — the time-to-next-event dual
    * (time-to-next-purchase, next-deploy-after-alert). Identical union +
    * carry construction scanned in DESCENDING time order, so it keeps the
    * same cost envelope: one key shuffle + one partition-local sort, O(1)
    * state per row. Ties (left.ts == right.ts) match, like `asof`; rows
    * tied on (key, ts) resolve to the greatest payload struct, like
    * `asof`.
    */
  def asofForward(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    requireOrderablePayload(right, payloadCols)
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftRow = struct(left.columns.map(col).toSeq: _*)
    val leftType = left.select(leftRow).schema.head.dataType

    val r = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__ts"),
      payload.as("__p"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"))
    val l = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__ts"),
      lit(null).cast(payloadType).as("__p"), lit(1).as("__side"),
      leftRow.as("__l"))

    // __p asc last: among right rows tied on (key, ts) the greatest
    // payload is carried — same deterministic rule as `asof`
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").desc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c)).toSeq
    val rightCols = payloadCols.map(c => col(s"__carry.$c").as(c))
    carried.select(leftCols ++ rightCols: _*)
  }
}
