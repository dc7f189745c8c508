package graft.pipeline

/** G5: dependency-aware task DAG (SURVEY §2.G5) — the orchestration
  * layer between [[BatchScheduler]] (WHEN a window fires) and
  * [[BankEtl]] (WHAT one task does): the reference's main.py runs a
  * fixed extract→transform→load sequence; a real warehouse run is a
  * GRAPH (dims before facts, facts before aggregates, quality gates
  * before publish) where one failure must skip exactly its downstream
  * cone and nothing else.
  *
  * Deliberately driver-side and sequential: tasks here are whole Spark
  * jobs (the cluster parallelism lives INSIDE each task), so the
  * scheduler's job is deterministic ordering + failure semantics, not
  * thread pools. Ordering is Kahn's algorithm with a lexicographic tie
  * break — the run order is a pure function of the graph, so reruns
  * and logs line up across machines.
  */
object TaskDag {

  /** One task: `run` is the side-effecting body (typically a Spark
    * action); `maxAttempts` ≥ 2 retries transient failures in place.
    */
  final case class Task(name: String, deps: Seq[String],
                        run: () => Unit, maxAttempts: Int = 1)

  sealed trait Status
  final case class Succeeded(attempts: Int) extends Status
  final case class Failed(attempts: Int, error: Throwable) extends Status
  /** Not attempted: some transitive dependency failed. */
  final case class SkippedUpstream(failedDep: String) extends Status

  final case class Report(order: Seq[String], status: Map[String, Status]) {
    def succeeded: Boolean = status.values.forall {
      case Succeeded(_) => true
      case _ => false
    }
  }

  /** Deterministic topological order (Kahn, lexicographic among ready
    * tasks). Fails loudly on duplicate names, unknown dependencies,
    * and cycles — naming one cycle member chain in the message.
    */
  def topoOrder(tasks: Seq[Task]): Seq[String] = {
    val names = tasks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate task names: ${names.diff(names.distinct).distinct}")
    val byName = tasks.map(t => t.name -> t).toMap
    tasks.foreach { t =>
      t.deps.foreach(d => require(byName.contains(d),
        s"task ${t.name} depends on unknown task $d"))
    }
    val remainingDeps = scala.collection.mutable.Map(
      tasks.map(t => t.name -> t.deps.toSet.size): _*)
    // edges deduped to match remainingDeps' toSet counting: a task
    // listing the same dep twice must be decremented once, not become
    // ready early (and then crash run() on the unvisited dep's status)
    val dependents = tasks.flatMap(t => t.deps.distinct.map(_ -> t.name))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
    val ready = scala.collection.mutable.SortedSet.empty[String]
    remainingDeps.foreach { case (n, d) => if (d == 0) ready += n }
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val n = ready.head
      ready -= n
      order += n
      dependents(n).foreach { m =>
        remainingDeps(m) -= 1
        if (remainingDeps(m) == 0) ready += m
      }
    }
    if (order.size != tasks.size) {
      // walk one cycle for the error message: follow unresolved deps
      // from any stuck node until a repeat
      val stuck = names.filterNot(order.contains).sorted
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      var cur = stuck.head
      while (!seen.contains(cur)) {
        seen += cur
        cur = byName(cur).deps.filter(stuck.contains).sorted.head
      }
      throw new IllegalArgumentException(
        s"dependency cycle: ${(seen.drop(seen.indexOf(cur)) :+ cur).mkString(" -> ")}")
    }
    order.toSeq
  }

  /** Run the DAG: tasks execute in [[topoOrder]]; a failure marks every
    * transitive dependent [[SkippedUpstream]] while independent
    * branches keep running. Retries re-invoke the body up to
    * `maxAttempts` times.
    */
  def run(tasks: Seq[Task]): Report = {
    val order = topoOrder(tasks)
    val byName = tasks.map(t => t.name -> t).toMap
    val status = scala.collection.mutable.Map.empty[String, Status]
    order.foreach { name =>
      val t = byName(name)
      val failedDep = t.deps.find(d => status(d) match {
        case Succeeded(_) => false
        case _ => true
      })
      status(name) = failedDep match {
        case Some(d) =>
          val root = status(d) match {
            case SkippedUpstream(r) => r
            case _ => d
          }
          SkippedUpstream(root)
        case None =>
          var attempt = 0
          var out: Status = null
          while (out == null) {
            attempt += 1
            try { t.run(); out = Succeeded(attempt) }
            catch {
              case scala.util.control.NonFatal(e) =>
                if (attempt >= t.maxAttempts) out = Failed(attempt, e)
            }
          }
          out
      }
    }
    Report(order, status.toMap)
  }
}
