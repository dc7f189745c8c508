package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.util.Properties

/** Central pipeline configuration — the reference's config/config.py
  * (env-var-driven MySQL staging/transformed + PostgreSQL production
  * endpoints, CSV path, log level, batch size; priviliges.sql:1 grants
  * the production user), re-expressed as one resolved, testable value.
  *
  * Resolution order per key, highest first (config.py's
  * `load_dotenv` + `os.getenv(key, default)` made explicit):
  *   1. the `overrides` map (flags / test injection)
  *   2. the process environment
  *   3. a `.env` file (KEY=VALUE lines, `#` comments), path from
  *      GRAFT_DOTENV or `<cwd>/.env` — same file the reference loads
  *   4. the built-in default
  *
  * The reference ships a live host/user/password as code defaults
  * (config.py:14-17) — graft deliberately does NOT: defaults are
  * localhost/empty, real endpoints come from the environment, and
  * [[Endpoint.redacted]] is the ONLY rendering the run log ever sees.
  */
object EtlConfig {

  /** One JDBC endpoint. `kind` ∈ mysql | postgresql (the two engines
    * the reference provisions; Spark's jdbc source addresses either
    * when its driver jar is on the executor classpath — absent in this
    * container, tracked per round in SURVEY §7h #7).
    */
  final case class Endpoint(kind: String, host: String, port: Int,
                            database: String, user: String,
                            password: String) {
    def jdbcUrl: String = s"jdbc:$kind://$host:$port/$database"

    def props: Properties = {
      val p = new Properties()
      p.setProperty("user", user)
      if (password.nonEmpty) p.setProperty("password", password)
      p.setProperty("driver", kind match {
        case "mysql" => "com.mysql.cj.jdbc.Driver"
        case _ => "org.postgresql.Driver"
      })
      p
    }

    /** Log-safe rendering: credentials never reach RunLog — user is
      * kept (operationally necessary), password is masked even when
      * empty (its presence/absence is itself a secret).
      */
    def redacted: String = s"$kind://$user:***@$host:$port/$database"
  }

  final case class Resolved(csvDataPath: String, logLevel: String,
                            batchSize: Int, staging: Endpoint,
                            transformed: Endpoint, production: Endpoint,
                            logLevelConfigured: Boolean = false) {
    /** The line EtlMain logs at startup — redacted by construction. */
    def describe: String =
      s"csv=$csvDataPath logLevel=$logLevel batchSize=$batchSize " +
        s"staging=${staging.redacted} transformed=${transformed.redacted} " +
        s"production=${production.redacted}"
  }

  /** Parse a dotenv file: KEY=VALUE lines, blank/# lines skipped,
    * single/double quotes around the value stripped (python-dotenv's
    * core behavior; no interpolation).
    */
  def parseDotenv(path: Path): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(path).asScala.iterator
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
        .map { l =>
          val i = l.indexOf('=')
          val k = l.substring(0, i).trim
          var v = l.substring(i + 1).trim
          if (v.length >= 2 && ((v.head == '"' && v.last == '"') ||
              (v.head == '\'' && v.last == '\'')))
            v = v.substring(1, v.length - 1)
          k -> v
        }
        .toMap
    }

  def load(overrides: Map[String, String] = Map.empty,
           env: Map[String, String] = sys.env,
           dotenvPath: Option[Path] = None): Resolved = {
    val dotenv = parseDotenv(dotenvPath.getOrElse(
      Paths.get(env.getOrElse("GRAFT_DOTENV", ".env"))))
    def get(key: String, default: String): String =
      overrides.getOrElse(key,
        env.getOrElse(key, dotenv.getOrElse(key, default)))
    def getInt(key: String, default: Int): Int = {
      val raw = get(key, default.toString)
      try raw.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be an integer, got '$raw'")
      }
    }
    val mysqlHost = get("MYSQL_HOST", "localhost")
    val mysqlUser = get("MYSQL_USER", "etl")
    val mysqlPass = get("MYSQL_PASSWORD", "")
    val mysqlPort = getInt("MYSQL_PORT", 3306)
    Resolved(
      csvDataPath = get("CSV_DATA_PATH", "./data"),
      logLevel = get("LOG_LEVEL", "INFO"),
      // whether ANY layer (override / env / dotenv) set LOG_LEVEL —
      // EtlMain applies the level only when it was actually configured,
      // so the logged config line and the applied level agree
      logLevelConfigured = overrides.contains("LOG_LEVEL") ||
        env.contains("LOG_LEVEL") || dotenv.contains("LOG_LEVEL"),
      batchSize = getInt("BATCH_SIZE", 1000),
      staging = Endpoint("mysql", mysqlHost, mysqlPort,
        get("MYSQL_STAGING_DATABASE", "stagging"), // sic — config.py:17
        mysqlUser, mysqlPass),
      transformed = Endpoint("mysql", mysqlHost, mysqlPort,
        get("MYSQL_TRANSFORMED_DATABASE", "transformed"),
        mysqlUser, mysqlPass),
      production = Endpoint("postgresql",
        get("POSTGRESQL_HOST", "localhost"),
        getInt("POSTGRESQL_PORT", 5432),
        get("POSTGRESQL_DATABASE", "bank_production"),
        get("POSTGRESQL_USER", "bank_app_user"),
        get("POSTGRESQL_PASSWORD", "")))
  }

  /** A [[graft.sources.JdbcStagingStore]] for an endpoint — how the
    * StagingStore JDBC modes pick up their connection config.
    */
  def store(e: Endpoint): graft.sources.JdbcStagingStore =
    new graft.sources.JdbcStagingStore(e.jdbcUrl, e.props)
}
