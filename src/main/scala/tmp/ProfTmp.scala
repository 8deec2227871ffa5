package tmpprof
import org.apache.spark.sql.SparkSession
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
    graft.operators.Bucketing.partitionPrunedDay(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 3) {
      val layout = t("prepareDayLayout")(
        graft.operators.Bucketing.prepareDayLayout(spark, dir))
      t("read.parquet(layout)")(spark.read.parquet(layout))
      val q = t("build query")(graft.operators.Bucketing.partitionPrunedDay(spark, dir))
      t("materialize")(q.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
