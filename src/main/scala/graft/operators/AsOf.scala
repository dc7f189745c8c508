package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * For each left row, attach the LATEST right row with
  * `right.ts <= left.ts` within the same key. Implemented by the
  * union + windowed-last-carry-forward technique: both sides are
  * tagged and unioned, then a single window per key (ordered by ts,
  * right-before-left on ties) carries the most recent right payload
  * forward onto each left row.
  *
  * Scale rationale (SURVEY.md §4): the naive formulation is a range
  * join (`l JOIN r ON key AND r.ts <= l.ts` + argmax), which explodes
  * to |l|×|r| pairs per key before pruning. The union+window form is
  * ONE shuffle on the key and a linear scan per partition — the same
  * shape a native sort-merge as-of implementation would produce, but
  * expressed with stock operators so AQE/codegen still apply.
  */
object AsOf {

  /** @param payloadCols right-side columns to carry; they appear in the
    *                    output as `asof_<name>` (null when no right row
    *                    precedes the left row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts AFTER right on ts ties
      .withColumn("__payload", lit(null)
        .cast(structType(right, payloadCols)))
    val r = right.select(keyCols :+ col(rightTs).as("__ts") :+
      lit(0).as("__side") :+
      struct(payloadCols.map(col): _*).as("__payload"): _*)
    // align schemas: right rows carry nulls for left's columns
    val leftCols = left.columns.toSeq
    val rUnion = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(rUnion)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))

    val out = carried.filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload")
    payloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__match.$c"))
    }.drop("__match")
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(c,
        df.schema(c).dataType, nullable = true)))

  /** Range (band) join: pair left and right rows with the same key whose
    * timestamps lie within ±`windowUs` of each other.
    *
    * The naive formulation is a non-equi join — Catalyst can only plan
    * it as a nested-loop, O(|l|×|r|) per key. This version buckets both
    * sides by `windowUs`-wide epochs and EXPLODES the right side into
    * its bucket and both neighbors: every qualifying pair now shares an
    * exact (key, bucket) — an equi-join — and the precise band predicate
    * filters the ≤3× candidates. Shuffle is hash-partitioned on
    * (key, bucket); cost is linear in matches, not in |l|×|r|.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTsUs: String, rightTsUs: String,
                windowUs: Long): DataFrame = {
    val keyCols = keys.map(col)
    val l = left.withColumn("__bucket", floor(col(leftTsUs) / windowUs))
    val r = right
      .withColumn("__boff", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket",
        floor(col(rightTsUs) / windowUs) + col("__boff"))
      .drop("__boff")
    l.join(r, keys :+ "__bucket")
      .filter(abs(col(leftTsUs) - col(rightTsUs)) <= windowUs)
      .drop("__bucket")
  }
}
