package graft
object ImgProbe2 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("32", "imgprobe2")
    val docs = Tables.documents(s, "/tmp/sf1")
    val pay = operators.Multimodal.withImagePayload(s, docs)
    println("payload partitions: " + pay.rdd.getNumPartitions)
    val t0 = System.nanoTime()
    println("count: " + operators.Multimodal.imageDecodeStats(s, pay).count())
    println(f"decode stats wall: ${(System.nanoTime()-t0)/1e9}%.2f s")
    s.stop()
  }
}
