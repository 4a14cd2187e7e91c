package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq(112946.26, 1.0, 150000.0, 0.001, 1e20).toDF("x").select(col("x").cast("string")).show(false)
    spark.sql("SELECT md5(concat_ws('|','a','2024-01-01','true','12.5')) AS h").show(false)
    Seq("a b c", "x  y", " z").toDF("t").select(split(col("t")," ").as("s1"), split(col("t"),"\\s+").as("s2")).show(false)
    spark.stop()
  }
}
