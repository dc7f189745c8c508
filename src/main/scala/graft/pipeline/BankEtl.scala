package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning
import graft.sources.CsvStaging

/** The reference pipeline end-to-end (main.py extract→transform→load),
  * as a composable library: a user of the reference can point graft at
  * the same CSV directory and get the same production tables.
  *
  * Entity schemas mirror config/config.py TABLE_SCHEMAS; the transform
  * derivations mirror src/transform.py (see Cleaning for line cites).
  * Every stage is a DataFrame → DataFrame function: no databases in the
  * middle — staging/transformed/production are storage-layer choices
  * (parquet paths, Delta, JDBC) orthogonal to the computation.
  */
object BankEtl {

  final case class EntitySchema(name: String, columns: Seq[String],
                                primaryKey: String)

  val schemas: Seq[EntitySchema] = Seq(
    EntitySchema("branches",
      Seq("branch_id", "branch_name", "city", "state", "manager_name"),
      "branch_id"),
    EntitySchema("customers",
      Seq("customer_id", "branch_id", "first_name", "last_name", "dob",
        "gender", "email", "phone", "address", "account_open_date"),
      "customer_id"),
    EntitySchema("loans",
      Seq("loan_id", "customer_id", "loan_type", "loan_amount",
        "interest_rate", "start_date", "end_date", "loan_status"),
      "loan_id"),
    EntitySchema("transactions",
      Seq("transaction_id", "customer_id", "transaction_date",
        "transaction_type", "amount", "balance_after", "fraud_flag"),
      "transaction_id"))

  /** Extract: raw-string staging from CSV (schema check, PK filter,
    * keep-last dedup) — reference src/extract.py.
    */
  def extract(spark: SparkSession, csvPath: String,
              entity: EntitySchema): CsvStaging.StagingResult =
    CsvStaging.read(spark, csvPath, entity.columns, entity.primaryKey)

  /** Transforms — reference src/transform.py:223-491, one per entity.
    * `batchDate` replaces the reference's wall-clock `date.today()`.
    */
  def transformBranches(df: DataFrame): DataFrame =
    df.select(
      col("branch_id"),
      Cleaning.cleanTextTitle(col("branch_name")).as("branch_name"),
      Cleaning.cleanTextTitle(col("city")).as("city"),
      Cleaning.cleanTextUpper(col("state")).as("state"),
      Cleaning.cleanTextTitle(col("manager_name")).as("manager_name"))
      .withColumn("region", Cleaning.regionOf(col("state")))

  def transformCustomers(df: DataFrame, batchDate: String): DataFrame = {
    val ref = lit(batchDate).cast("date")
    val dob = Cleaning.parseDateMulti(col("dob"))
    val opened = Cleaning.parseDateMulti(col("account_open_date"))
    val tenure = Cleaning.tenureDays(opened, ref)
    df.select(
      col("customer_id"),
      Cleaning.cleanText(col("branch_id")).as("branch_id"),
      Cleaning.cleanTextTitle(col("first_name")).as("first_name"),
      Cleaning.cleanTextTitle(col("last_name")).as("last_name"),
      dob.as("dob"),
      Cleaning.ageAt(dob, ref).as("age"),
      Cleaning.normalizeGender(col("gender")).as("gender"),
      Cleaning.cleanTextLower(col("email")).as("email"),
      Cleaning.cleanText(col("phone")).as("phone"),
      Cleaning.cleanTextTitle(col("address")).as("address"),
      opened.as("account_open_date"),
      tenure.as("customer_tenure_days"),
      Cleaning.customerSegment(tenure).as("customer_segment"))
  }

  def transformLoans(df: DataFrame): DataFrame = {
    val start = Cleaning.parseDateMulti(col("start_date"))
    val end = Cleaning.parseDateMulti(col("end_date"))
    val amount = Cleaning.parseNumber(col("loan_amount"))
    df.select(
      col("loan_id"),
      Cleaning.cleanText(col("customer_id")).as("customer_id"),
      Cleaning.cleanTextTitle(col("loan_type")).as("loan_type"),
      amount.as("loan_amount"),
      Cleaning.parseNumber(col("interest_rate")).as("interest_rate"),
      start.as("start_date"),
      end.as("end_date"),
      Cleaning.cleanTextTitle(col("loan_status")).as("loan_status"),
      Cleaning.monthsBetweenWhole(start, end).as("loan_duration_months"),
      Cleaning.riskCategory(amount).as("risk_category"))
  }

  def transformTransactions(df: DataFrame): DataFrame = {
    val amount = Cleaning.parseNumber(col("amount"))
    df.select(
      col("transaction_id"),
      Cleaning.cleanText(col("customer_id")).as("customer_id"),
      Cleaning.parseDateMulti(col("transaction_date")).as("transaction_date"),
      Cleaning.cleanTextUpper(col("transaction_type")).as("transaction_type"),
      amount.as("amount"),
      Cleaning.parseNumber(col("balance_after")).as("balance_after"),
      Cleaning.parseBool(col("fraud_flag")).as("fraud_flag"),
      Cleaning.txnCategory(amount).as("transaction_category"))
  }

  def transform(entity: String, staged: DataFrame,
                batchDate: String = graft.BatchDate): DataFrame =
    entity match {
      case "branches" => transformBranches(staged)
      case "customers" => transformCustomers(staged, batchDate)
      case "loans" => transformLoans(staged)
      case "transactions" => transformTransactions(staged)
      case other => sys.error(s"unknown entity: $other")
    }

  /** Load: incremental append of new keys only — reference src/load.py,
    * re-expressed as an anti-join (see operators.Loads).
    */
  def loadIncremental(transformed: DataFrame, existing: DataFrame,
                      key: String): DataFrame =
    graft.operators.Loads.incrementalNew(transformed, existing, Seq(key))

  /** Per-stage row metrics via `observe` — collected by the driver with
    * zero extra jobs (reference main.py ETLMetrics analog).
    */
  def withRowMetric(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))
}
