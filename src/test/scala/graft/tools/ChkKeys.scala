package graft.tools
object ChkKeys {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    val r = graft.SparkEntry.rowsOnly
    println("queries=" + q.size + " oracles=" + o.size + " rowsOnly=" + r.size)
    println("no-oracle-not-rowsonly: " + (q -- o -- r).toSeq.sorted.mkString(","))
    println("oracle-without-query: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
