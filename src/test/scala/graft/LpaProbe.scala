package graft
import org.apache.spark.sql.functions._
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "lpa-probe")
    val d = "/root/testdata/sf0.1"
    val t0 = System.nanoTime
    val e = operators.Graph.tradeEdges(Tables.orders(spark, d), Tables.lineitem(spark, d))
    println(s"edges: ${e.count()} in ${(System.nanoTime-t0)/1e9}")
    for (r <- 1 to 4) {
      val t = System.nanoTime
      val out = operators.Graph.labelPropagation(e, rounds = r)
      val n = out.count()
      println(s"rounds=$r nodes=$n wall=${(System.nanoTime-t)/1e9}")
    }
    val t5 = System.nanoTime
    val out = operators.Graph.labelPropagation(e, rounds = 4)
    println("=== final plan ===")
    out.explain("formatted")
    println(s"4-round repeat wall=${(System.nanoTime-t5)/1e9}")
    spark.stop()
  }
}
