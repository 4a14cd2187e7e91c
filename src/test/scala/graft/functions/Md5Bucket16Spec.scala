package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5Bucket16Spec extends SparkSpec {
  import spark.implicits._

  private def withFn[T](f: => T): T = { GraftFunctions.register(spark); f }

  test("bit-identical to the builtin conv(substring(md5)) chain") {
    withFn {
      val rnd = new scala.util.Random(7)
      val rows = Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) ++
        Seq("", " ", "a b", "ünïcode ✓", "0", "dup dup")
      val df = rows.toDF("s")
        .withColumn("native", expr("md5_bucket16(s)"))
        .withColumn("builtin",
          conv(substring(md5($"s"), 1, 4), 16, 10).cast("int"))
      assert(df.filter($"native" =!= $"builtin").count() == 0)
      // range pin: always an unsigned 16-bit value
      assert(df.filter($"native" < 0 || $"native" > 65535).count() == 0)
    }
  }

  test("null in, null out") {
    withFn {
      val got = spark.sql("SELECT md5_bucket16(CAST(NULL AS STRING)) AS b")
        .select($"b").as[Option[Int]].head()
      assert(got.isEmpty)
    }
  }

  test("injected via SparkSessionExtensions: resolves in a fresh session") {
    val fresh = spark.newSession()
    val b = fresh.sql("SELECT md5_bucket16('hello') AS b").collect().head.getInt(0)
    assert(b == 0x5d41) // md5('hello') = 5d41402a... → first 16 bits
  }

  test("stays inside whole-stage codegen over a real scan") {
    withFn {
      val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(expr("md5_bucket16(text)").as("b"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p)
    }
  }
}
