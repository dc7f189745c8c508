package graft.sources.v2

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 `TableProvider` — the modern connector surface the
  * rest of graft's sources (plain files) never needed: a deterministic
  * integer sequence table `[start, end)` whose READER, not a
  * post-scan Filter, honors range predicates on `id`.
  *
  * Why it exists (SURVEY §2.H31): exercises the remaining Spark
  * extension point end-to-end the way a real connector (JDBC range,
  * kafka offsets, an index server) would —
  *  - `SupportsPushDownFilters`: =, <, <=, >, >= on `id` NARROW the
  *    generated bounds at PLANNING time; at 100 TB this is the
  *    difference between reading a partition and reading a table.
  *    Non-range filters stay post-scan (returned as residuals).
  *  - `SupportsPushDownRequiredColumns`: a `count(*)` reads ZERO
  *    columns — the reader emits empty rows.
  *  - `planInputPartitions`: the surviving range splits into `slices`
  *    even pieces — pruning composes with parallelism (an
  *    already-empty range plans ZERO partitions).
  *
  * Usage: `spark.read.format("graft.sources.v2.RangeTableProvider")
  * .option("start", a).option("end", b).option("slices", k).load()`.
  */
class RangeTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeTableProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "0").toLong,
      properties.getOrDefault("slices", "4").toInt)

  override def supportsExternalMetadata(): Boolean = false
}

object RangeTableProvider {
  val schema: StructType =
    StructType(Seq(StructField("id", LongType, nullable = false)))
}

private[v2] class RangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($start, $end)"
  override def schema(): StructType = RangeTableProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices)
}

private[v2] class RangeScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = start
  private var hi = end
  private var pushed = mutable.ArrayBuffer.empty[Filter]
  private var readSchema: StructType = RangeTableProvider.schema

  /** Range predicates on `id` tighten [lo, hi) at planning time and
    * report as PUSHED (Spark drops its post-scan copy); everything
    * else returns as a residual for Spark to evaluate. Half-open
    * bounds: `id < v` → hi = min(hi, v); `id <= v` → hi = min(hi, v+1).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = mutable.ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThanOrEqual("id", v: Long) =>
        lo = math.max(lo, v); pushed += f
      case f @ GreaterThan("id", v: Long) =>
        // v+1 overflows at Long.MaxValue; [lo, hi) can't contain
        // MaxValue anyway, so saturating keeps the scan empty-correct
        lo = math.max(lo, if (v == Long.MaxValue) v else v + 1); pushed += f
      case f @ LessThan("id", v: Long) =>
        hi = math.min(hi, v); pushed += f
      case f @ LessThanOrEqual("id", v: Long) =>
        // id <= MaxValue is trivially true — no upper narrowing (v+1
        // would wrap to MinValue and collapse the scan to empty while
        // the filter was reported pushed: silently wrong empty result)
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
        pushed += f
      case f @ EqualTo("id", v: Long) =>
        lo = math.max(lo, v)
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
        pushed += f
      case f @ IsNotNull("id") =>
        pushed += f // non-nullable: trivially true, absorb it
      case other => residual += other
    }
    residual.toArray
  }
  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    readSchema = requiredSchema

  override def build(): Scan =
    new RangeScan(lo, math.max(lo, hi), slices, readSchema)
}

private[v2] class RangeScan(lo: Long, hi: Long, slices: Int,
                            override val readSchema: StructType)
    extends Scan with Batch {
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range [$lo, $hi) slices=$slices cols=${readSchema.fieldNames.length}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val k = math.min(slices.toLong, n).toInt
    (0 until k).map { i =>
      // even split with the remainder spread over the first partitions
      val a = lo + i * n / k
      val b = lo + (i + 1) * n / k
      RangePartition(a, b): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(readSchema.fieldNames.nonEmpty)
}

private[v2] case class RangePartition(lo: Long, hi: Long)
    extends InputPartition

private[v2] class RangeReaderFactory(emitId: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      private val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          if (emitId) 1 else 0)
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow = {
        if (emitId) row.update(0, cur)
        row
      }
      override def close(): Unit = ()
    }
  }
}
