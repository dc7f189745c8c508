package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema'd JSONL ingestion (SURVEY §2.A3) — the canonical LLM-corpus
  * interchange format.
  *
  * Malformed lines are NOT silently dropped (the default) and NOT a
  * pipeline abort (FAILFAST): they land in a corrupt-record side
  * channel so a 100 TB ingest can quantify and quarantine bad input
  * while the good rows proceed — the same report-don't-reject stance
  * as operators.Validate.
  */
object JsonlSource {

  final case class JsonlResult(good: DataFrame, corrupt: DataFrame)

  private val CorruptCol = "_graft_corrupt"

  def read(spark: SparkSession, path: String,
           schema: StructType): JsonlResult = {
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache() // PERMISSIVE corrupt-column semantics require stable scan
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col): _*)
    val corrupt = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    JsonlResult(good, corrupt)
  }
}
