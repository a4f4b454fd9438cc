package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (stream-state enrichment) join.
  *
  * The reference enriches each incoming record with the *current* state of
  * its key — an ask into the keyspace at the record's processing time
  * (reference pattern: ExampleBank.scala:48-50, SURVEY §2.4 J6). The batch
  * equivalent over event time: for each left record, attach the latest right
  * record with the same key and ts ≤ left.ts.
  *
  * Implementation is the union-tag-window trick, not a range join: both
  * sides are tagged and unioned, then `last(right_payload) ignore nulls`
  * over (key ORDER BY ts, side) carries the most recent right value forward
  * onto each left row. One shuffle on the key, per-partition sort, zero
  * row explosion — this survives 100× scale where a theta/range join
  * (O(n·m) per key) would not.
  */
object AsOfJoin {

  /** left/right must share `keyCol`; both need epoch-µs `tsCol`.
    * Right columns are attached with prefix `right_`. `rightCols` are the
    * payload columns to carry. Right rows at exactly left.ts are visible
    * (ties resolve right-before-left). */
  /** `rightTieBreak`: right payload columns ordering equal-timestamp right
    * rows (latest wins) — required for determinism when right timestamps can
    * collide within a key. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("_side", "_payload", "_asof") ++ rightCols.map(c => s"right_$c")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"asOf reserves column name(s) ${clash.mkString(", ")} on the left side")
    val leftTagged = left.withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(structType(right, rightCols)))
    val rightTagged = right
      .select(col(keyCol), col(tsCol),
        struct(rightCols.map(col): _*).as("_payload"))
      .withColumn("_side", lit(0))

    val unioned = leftTagged.select(
      (left.columns.map(col) :+ col("_side") :+ col("_payload")): _*)
      .unionByName(rightTagged.select(col(keyCol), col(tsCol), col("_side"), col("_payload")),
        allowMissingColumns = true)

    val tieCols = rightTieBreak.map(c => col("_payload").getField(c))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol) +: col("_side") +: tieCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned.withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
    val leftOut = carried.filter(col("_side") === 1)
    rightCols.foldLeft(leftOut) { (df, c) =>
      df.withColumn(s"right_$c", col("_asof").getField(c))
    }.drop("_side", "_payload", "_asof")
  }

  /** Nearest-direction as-of join (pandas `merge_asof(direction='nearest')`
    * semantics): each left row attaches the right row minimizing |Δts|
    * within its key — ties (equal distance both ways) resolve BACKWARD.
    *
    * Same union-tag-window shape as [[asOf]], evaluated in both directions
    * over ONE key exchange (the backward `last ignore nulls` and forward
    * `first ignore nulls` windows share partitioning AND sort order), then
    * a row-local distance compare. Still zero row explosion — a range join
    * would pay O(n·m) per key for the same answer.
    *
    * At equal right timestamps the backward carry keeps the LAST right row
    * in `rightTieBreak` order (latest wins, as in [[asOf]]) and the forward
    * carry keeps the FIRST — both deterministic. Adds `right_<c>` columns
    * plus `asof_dist_us` (null when the key has no right rows). */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = tsCol +: rightCols
    val reserved = Seq("_side", "_payload", "_bw", "_fw", "asof_dist_us") ++
      rightCols.map(c => s"right_$c")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"asOfNearest reserves column name(s) ${clash.mkString(", ")} on the left side")
    val leftTagged = left.withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(structType(right, payloadCols)))
    val rightTagged = right
      .select(col(keyCol), col(tsCol),
        struct(payloadCols.map(col): _*).as("_payload"))
      .withColumn("_side", lit(0))
    val unioned = leftTagged.select(
      (left.columns.map(col) :+ col("_side") :+ col("_payload")): _*)
      .unionByName(rightTagged.select(col(keyCol), col(tsCol), col("_side"), col("_payload")),
        allowMissingColumns = true)
    val tieCols = rightTieBreak.map(c => col("_payload").getField(c))
    val ord = Window.partitionBy(keyCol)
      .orderBy(col(tsCol) +: col("_side") +: tieCols: _*)
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward carry as a RUNNING window over the REVERSED order (last
    // ignore-nulls to the current row in DESC ≡ first ignore-nulls from
    // the current row in ASC, current row included on both spellings):
    // Spark's unbounded-FOLLOWING frames re-aggregate from each row to
    // the partition end — O(n²) on a hot key (132 s on the skew world's
    // single-user events, r14 skew bench) — while running frames are
    // incremental. Same one exchange; the reversed sort stays in-partition.
    val ordDesc = Window.partitionBy(keyCol)
      .orderBy((col(tsCol) +: col("_side") +: tieCols).map(_.desc): _*)
    val wFwd = ordDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_bw", last(col("_payload"), ignoreNulls = true).over(wBack))
      .withColumn("_fw", last(col("_payload"), ignoreNulls = true).over(wFwd))
      .filter(col("_side") === 1)
    val db = col(tsCol) - col("_bw").getField(tsCol)
    val df_ = col("_fw").getField(tsCol) - col(tsCol)
    val chosen = when(col("_bw").isNull, col("_fw"))
      .when(col("_fw").isNull, col("_bw"))
      .when(db <= df_, col("_bw"))
      .otherwise(col("_fw"))
    val withChoice = carried.withColumn("_payload", chosen)
      .withColumn("asof_dist_us",
        abs(col(tsCol) - col("_payload").getField(tsCol)))
    rightCols.foldLeft(withChoice) { (df, c) =>
      df.withColumn(s"right_$c", col("_payload").getField(c))
    }.drop("_side", "_payload", "_bw", "_fw")
  }

  private def structType(df: DataFrame, cols: Seq[String]) = {
    val fields = cols.map(c => df.schema(c))
    org.apache.spark.sql.types.StructType(fields)
  }
}
