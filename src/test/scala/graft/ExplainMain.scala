package graft
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("8", "explain")
    for (name <- args) {
      println(s"=== $name ===")
      println(SparkEntry.queries(name)(s, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(2800))
    }
    s.stop()
  }
}
