package graft

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Engine.tables.all) {
      println(s"=== $t ===")
      try {
        val df = Engine.table(spark, dir, t)
        df.printSchema()
        println("rows=" + df.count())
      } catch { case e: Throwable => println("FAILED: " + e.getMessage.take(300)) }
    }
    spark.stop()
  }
}
