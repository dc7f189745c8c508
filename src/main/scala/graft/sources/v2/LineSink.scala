package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path — the sink half of H31's connector story:
  * a delimited-line directory sink whose correctness rests on the
  * two-phase commit protocol every real batch sink (file committer,
  * JDBC staging table, object-store multipart) implements:
  *
  *  - each TASK writes to a uniquely-named temp file
  *    (`_tmp/part-<partition>-<task>`) and reports it in its commit
  *    MESSAGE — nothing a running or speculative task writes is
  *    visible;
  *  - the DRIVER's `commit(messages)` renames exactly the reported
  *    files into place and drops a `_SUCCESS` marker — rename is the
  *    atomic visibility point, and only task attempts that REPORTED
  *    (i.e. completed) participate;
  *  - `abort()` deletes the temp area — a failed job leaves the
  *    target exactly as it was.
  *
  * Schema support is deliberately small (long/int/double/string/
  * boolean → tab-separated lines): the protocol, not the encoding, is
  * what this exercises. Append mode only.
  *
  * Usage: `df.write.format("graft.sources.v2.LineSinkProvider")
  * .option("path", dir).mode("append").save()`.
  */
class LineSinkProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // schema comes from the written DataFrame

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LineSinkTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private[v2] class LineSinkTable(path: String, schema0: StructType)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft line sink: 'path' option required")
  override def name(): String = s"graft_line_sink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new LineSinkBatchWrite(path, info.schema(), info.queryId())
      }
    }
}

/** Driver-side committer: rename-on-commit, delete-on-abort. */
private[graft] class LineSinkBatchWrite(path: String, schema: StructType,
                                        queryId: String)
    extends BatchWrite {
  private val dir = Paths.get(path)
  private val tmp = dir.resolve("_tmp")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(tmp)
    new LineWriterFactory(path, schema, queryId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // only files REPORTED by completed tasks become visible; the
    // rename is the atomic visibility point per file, _SUCCESS marks
    // the job-level commit
    messages.foreach { case LineCommit(tmpName, finalName) =>
      Files.move(tmp.resolve(tmpName), dir.resolve(finalName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    deleteTmp()
    Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteTmp() // target untouched — nothing was ever renamed in

  private def deleteTmp(): Unit = {
    if (Files.isDirectory(tmp)) {
      // Files.list leaks a directory fd unless closed explicitly
      val listing = Files.list(tmp)
      try listing.forEach(p => Files.deleteIfExists(p))
      finally listing.close()
      Files.deleteIfExists(tmp)
    }
  }
}

private[graft] case class LineCommit(tmpName: String, finalName: String)
    extends WriterCommitMessage

private[graft] class LineWriterFactory(path: String, schema: StructType,
                                       queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LineDataWriter(path, schema, partitionId, taskId, queryId)
}

/** Task-side writer: buffers to `_tmp/part-<partition>-<task>`; the
  * unique task id in the name makes retried/speculative attempts
  * collision-free — only the attempt whose message reaches the driver
  * gets renamed in.
  */
private[graft] class LineDataWriter(path: String, schema: StructType,
                                 partitionId: Int, taskId: Long,
                                 queryId: String)
    extends DataWriter[InternalRow] {
  private val tmpName = f"part-$partitionId%05d-$taskId"
  // the job's queryId in the FINAL name keeps a second append job from
  // silently replacing the first one's files (ATOMIC_MOVE overwrites
  // on POSIX): each job lands a disjoint file set, like Spark's own
  // part-...-<uuid> naming
  private val finalName = f"part-$partitionId%05d-$queryId.tsv"
  private val file: Path = Paths.get(path, "_tmp", tmpName)
  private val out = Files.newBufferedWriter(file, StandardCharsets.UTF_8)

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "" else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType => row.getUTF8String(i).toString
        case dt => throw new IllegalArgumentException(
          s"graft line sink: unsupported type $dt for column ${f.name}")
      }
    }.mkString("\t")
    out.write(line); out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    LineCommit(tmpName, finalName)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(file)
  }

  override def close(): Unit = ()
}
