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

  /** Parse-once staging: the date ladders are projected in a FIRST
    * select and every derived column references the parsed ATTRIBUTE,
    * never a second copy of the parse tree. Re-using the raw `Column`
    * (the pre-r9 shape) inlined the whole multi-format coalesce ladder
    * once per reference — `ageAt(dob)` alone reads `dob` six times —
    * and the resulting tree, fused under a downstream no-key aggregate,
    * generated a single >64 KB method that janino rejects and Spark
    * silently runs interpreted (r8 VERDICT #1). Catalyst's
    * CollapseProject deliberately keeps non-cheap multi-referenced
    * projections in separate operators, so the two-stage shape survives
    * optimization and every generated method stays splittable.
    * CodegenCanarySpec holds this closed with codegen.fallback=false.
    */
  def transformCustomers(df: DataFrame, batchDate: String): DataFrame = {
    val ref = lit(batchDate).cast("date")
    val parsed = df.select(
      col("customer_id"),
      Cleaning.cleanText(col("branch_id")).as("branch_id"),
      Cleaning.cleanTextTitle(col("first_name")).as("first_name"),
      Cleaning.cleanTextTitle(col("last_name")).as("last_name"),
      Cleaning.parseDateMulti(col("dob")).as("dob"),
      Cleaning.normalizeGender(col("gender")).as("gender"),
      Cleaning.cleanTextLower(col("email")).as("email"),
      Cleaning.cleanText(col("phone")).as("phone"),
      Cleaning.cleanTextTitle(col("address")).as("address"),
      Cleaning.parseDateMulti(col("account_open_date"))
        .as("account_open_date"))
    parsed
      .withColumn("age", Cleaning.ageAt(col("dob"), ref))
      .withColumn("customer_tenure_days",
        Cleaning.tenureDays(col("account_open_date"), ref))
      .withColumn("customer_segment",
        Cleaning.customerSegment(col("customer_tenure_days")))
      .select(col("customer_id"), col("branch_id"), col("first_name"),
        col("last_name"), col("dob"), col("age"), col("gender"),
        col("email"), col("phone"), col("address"),
        col("account_open_date"), col("customer_tenure_days"),
        col("customer_segment"))
  }

  /** Same parse-once staging as [[transformCustomers]] — duration and
    * risk derive from the parsed attributes.
    */
  def transformLoans(df: DataFrame): DataFrame = {
    val parsed = df.select(
      col("loan_id"),
      Cleaning.cleanText(col("customer_id")).as("customer_id"),
      Cleaning.cleanTextTitle(col("loan_type")).as("loan_type"),
      Cleaning.parseNumber(col("loan_amount")).as("loan_amount"),
      Cleaning.parseNumber(col("interest_rate")).as("interest_rate"),
      Cleaning.parseDateMulti(col("start_date")).as("start_date"),
      Cleaning.parseDateMulti(col("end_date")).as("end_date"),
      Cleaning.cleanTextTitle(col("loan_status")).as("loan_status"))
    parsed
      .withColumn("loan_duration_months",
        Cleaning.monthsBetweenWhole(col("start_date"), col("end_date")))
      .withColumn("risk_category",
        Cleaning.riskCategory(col("loan_amount")))
  }

  /** Same parse-once staging — the txn bucket derives from the parsed
    * amount attribute.
    */
  def transformTransactions(df: DataFrame): DataFrame = {
    val parsed = df.select(
      col("transaction_id"),
      Cleaning.cleanText(col("customer_id")).as("customer_id"),
      Cleaning.parseDateMulti(col("transaction_date")).as("transaction_date"),
      Cleaning.cleanTextUpper(col("transaction_type")).as("transaction_type"),
      Cleaning.parseNumber(col("amount")).as("amount"),
      Cleaning.parseNumber(col("balance_after")).as("balance_after"),
      Cleaning.parseBool(col("fraud_flag")).as("fraud_flag"))
    parsed.withColumn("transaction_category",
      Cleaning.txnCategory(col("amount")))
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
