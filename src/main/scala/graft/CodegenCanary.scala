package graft

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Harness canary against SILENT whole-stage-codegen fallback.
  *
  * When a generated method exceeds janino's 64 KB limit (or any other
  * compile error fires), Spark logs one ERROR from `CodeGenerator` and
  * quietly re-executes the stage interpreted — correctness survives,
  * but the stage runs 3–10× slower, which at 100 TB is a real outage
  * this repo has now hit twice (round-3 DotProduct `freshName`, round-8
  * BankEtl date-ladder fusion). Tests can't see the fallback through
  * results, so this canary watches the LOG: it attaches a counting
  * appender to the codegen logger and any ERROR there fails the run.
  *
  * Used two ways:
  *  - [[Verify]] installs it for the whole gate sweep and exits nonzero
  *    if any query compiled dirty — the driver's correctness gate then
  *    doubles as a zero-interpreted-fallback gate;
  *  - CodegenCanarySpec drives the historically fragile EtlMain shapes
  *    under `spark.sql.codegen.fallback=false` AND this watcher.
  */
object CodegenCanary {

  /** Loggers that signal a codegen failure. Both the expression
    * compiler (`...codegen.CodeGenerator`) and the whole-stage exec
    * node (`...execution.WholeStageCodegenExec`, which warn-logs the
    * fallback decision) are watched; ERROR-level only, so INFO timing
    * lines don't count.
    */
  private val WatchedSuffixes =
    Seq("CodeGenerator", "WholeStageCodegenExec")

  final class Handle private[CodegenCanary] (appender: CanaryAppender) {
    def errorCount: Int = appender.count.get()
    def firstError: Option[String] = Option(appender.samples.peek())
    def errors: Seq[String] = {
      val it = appender.samples.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }

    def uninstall(): Unit = {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      ctx.getConfiguration.getRootLogger.removeAppender(appender.getName)
      ctx.updateLoggers()
      appender.stop()
    }

    /** Throw (with the first captured message) if any codegen error
      * fired since install.
      */
    def assertClean(): Unit =
      if (errorCount > 0)
        throw new IllegalStateException(
          s"codegen canary: $errorCount CodeGenerator error(s) — a stage " +
            s"fell back to interpreted execution. First: " +
            firstError.getOrElse("<no message captured>"))
  }

  private final class CanaryAppender(name: String)
      extends AbstractAppender(name, null, null, true, Property.EMPTY_ARRAY) {
    val count = new AtomicInteger(0)
    val samples = new ConcurrentLinkedQueue[String]
    override def append(event: LogEvent): Unit = {
      val logger = event.getLoggerName
      if (event.getLevel.isMoreSpecificThan(Level.ERROR) &&
          WatchedSuffixes.exists(logger.endsWith)) {
        count.incrementAndGet()
        if (samples.size() < 8)
          samples.add(s"$logger: ${event.getMessage.getFormattedMessage}")
      }
    }
  }

  /** Attach the watcher to the root logger config (events from every
    * logger flow through it regardless of per-logger levels, as long
    * as the codegen logger itself is ≥ ERROR — Spark never mutes its
    * compile-failure ERROR in any of our run modes).
    */
  def install(): Handle = {
    val appender = new CanaryAppender(
      s"graft-codegen-canary-${java.util.UUID.randomUUID()}")
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.getRootLogger.addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
    new Handle(appender)
  }

  /** install → body → assertClean → uninstall. */
  def watching[T](body: => T): T = {
    val h = install()
    try { val out = body; h.assertClean(); out }
    finally h.uninstall()
  }
}
