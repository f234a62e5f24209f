package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.printSchema()
    val e2 = e.withColumn("ts2", timestamp_micros(expr("ts div 1000")))
    e2.select(col("ts"), col("ts2"),
      date_format(col("ts2"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s")).show(3, false)
    spark.stop()
  }
}
