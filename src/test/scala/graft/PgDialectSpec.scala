package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcUpsert

/** Live-PostgreSQL validation of the generated dialect SQL (VERDICT r5
  * missing #1: "42P10-class surprises only show against the real
  * engines"). This container ships a PostgreSQL 15 server binary but
  * NO PostgreSQL JDBC driver jar (and zero egress to fetch one), so
  * the executor plumbing cannot connect — what CAN run for real is
  * every piece of SQL text the dialect path generates: the bootstrap
  * PK DDL, the `ON CONFLICT … DO UPDATE SET c = EXCLUDED.c` upsert
  * (with JDBC `?` placeholders bound as literals), identifier
  * quoting, the DO NOTHING all-key form, and the two failure modes
  * the round-5/6 guards exist for (42P10 without a unique constraint;
  * PK DDL failing on duplicate rows). The spec bootstraps its own
  * throwaway cluster (initdb/pg_ctl as the unprivileged postgres
  * user) and cancels cleanly where that's impossible. MySQL has
  * neither server nor driver here — its dialect stays text-only.
  */
class PgDialectSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val bin = "/usr/lib/postgresql/15/bin"
  private val port = 55433
  private var dir: String = _
  private var up = false

  private def sh(cmd: String*): (Int, String) = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    (p.waitFor(), out)
  }

  override def beforeAll(): Unit = {
    if (!new java.io.File(s"$bin/initdb").canExecute) return
    if (sh("id", "-u", "postgres")._1 != 0) return
    dir = java.nio.file.Files.createTempDirectory("graft_pg").toString
    if (sh("chown", "-R", "postgres:postgres", dir)._1 != 0) return
    val init = sh("su", "postgres", "-s", "/bin/bash", "-c",
      s"$bin/initdb -D $dir/data -U graft --no-sync")
    if (init._1 != 0) return
    val start = sh("su", "postgres", "-s", "/bin/bash", "-c",
      s"$bin/pg_ctl -D $dir/data -l $dir/log -w " +
        s"-o '-p $port -k $dir -c listen_addresses=127.0.0.1' start")
    up = start._1 == 0
  }

  override def afterAll(): Unit = if (up) {
    sh("su", "postgres", "-s", "/bin/bash", "-c",
      s"$bin/pg_ctl -D $dir/data -m immediate stop")
    ()
  }

  private def psql(sql: String): (Int, String) =
    sh(s"$bin/psql", "-h", "127.0.0.1", "-p", port.toString, "-U", "graft",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-t", "-A", "-c", sql)

  private def ok(sql: String): String = {
    val (code, out) = psql(sql)
    assert(code == 0, s"psql failed on:\n$sql\n$out")
    out.trim
  }

  /** JDBC `?` placeholders → positional SQL literals (test binding —
    * the real path binds through PreparedStatement, Derby-tested).
    */
  private def bind(sql: String, vals: String*): String = {
    val parts = sql.split("\\?", -1)
    assert(parts.length == vals.length + 1, "placeholder/value mismatch")
    parts.zipWithIndex.map { case (p, i) =>
      p + (if (i < vals.length) vals(i) else "")
    }.mkString
  }

  test("bootstrap PK DDL + ON CONFLICT upsert replay on real PostgreSQL") {
    assume(up, "no local PostgreSQL server could be bootstrapped")
    // the table exactly as Spark's JDBC sink creates it: table name
    // pasted raw, columns quoted case-exact, NO constraints
    ok("""CREATE TABLE customers ("id" BIGINT, "name" TEXT, "bal" DOUBLE PRECISION)""")
    ok(JdbcUpsert.primaryKeySql("postgres", "customers", Seq("id")))
    val up1 = JdbcUpsert.postgresSql("customers",
      Seq("id", "name", "bal"), Seq("id"))
    ok(bind(up1, "1", "'alice'", "10.5"))
    ok(bind(up1, "2", "'bob'", "3.25"))
    // replay with changed values: SCD1 update-in-place, no duplication
    ok(bind(up1, "1", "'alice2'", "99.0"))
    assert(ok("SELECT count(*) FROM customers") == "2")
    assert(ok("""SELECT "name" FROM customers WHERE "id" = 1""") == "alice2")
    // idempotent replay of an identical row changes nothing
    ok(bind(up1, "2", "'bob'", "3.25"))
    assert(ok("SELECT count(*) FROM customers") == "2")
  }

  test("ON CONFLICT without a unique constraint fails 42P10 — the " +
    "hasUniqueKey probe's reason for existing") {
    assume(up, "no local PostgreSQL server could be bootstrapped")
    ok("""CREATE TABLE plain ("id" BIGINT, "v" TEXT)""")
    val (code, out) = psql(bind(
      JdbcUpsert.postgresSql("plain", Seq("id", "v"), Seq("id")),
      "1", "'x'"))
    assert(code != 0 &&
      out.contains("no unique or exclusion constraint"), out)
  }

  test("all-key table plans DO NOTHING and replays idempotently") {
    assume(up, "no local PostgreSQL server could be bootstrapped")
    ok("""CREATE TABLE ak ("d" BIGINT)""")
    ok(JdbcUpsert.primaryKeySql("postgres", "ak", Seq("d")))
    val up1 = JdbcUpsert.postgresSql("ak", Seq("d"), Seq("d"))
    assert(up1.endsWith("DO NOTHING"))
    ok(bind(up1, "7"))
    ok(bind(up1, "7"))
    assert(ok("SELECT count(*) FROM ak") == "1")
  }

  test("PK DDL fails on pre-existing duplicate keys — why the bootstrap " +
    "validates the batch first and the repair path falls back") {
    assume(up, "no local PostgreSQL server could be bootstrapped")
    ok("""CREATE TABLE dup ("id" BIGINT, "v" TEXT)""")
    ok("""INSERT INTO dup VALUES (1, 'a'), (1, 'b')""")
    val (code, out) = psql(
      JdbcUpsert.primaryKeySql("postgres", "dup", Seq("id")))
    assert(code != 0 && out.contains("could not create unique index"), out)
  }
}
