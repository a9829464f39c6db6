package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args.head)(spark, "/root/testdata/sf0.001")
    println("PLAN-START")
    println(df.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
