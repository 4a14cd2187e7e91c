package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotI64Spec extends SparkSpec {
  import spark.implicits._

  private def withFn[T](f: => T): T = { GraftFunctions.register(spark); f }

  test("matches the higher-order-function formulation on random arrays") {
    withFn {
      val rnd = new scala.util.Random(1)
      val rows = Seq.fill(50)((
        Array.fill(64)(rnd.nextInt(200).toLong - 100),
        Array.fill(64)(rnd.nextInt(200).toLong - 100)))
      val df = rows.toDF("a", "b")
        .withColumn("native", expr("dot_i64(a, b)"))
        .withColumn("hof", aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0L), (acc, x) => acc + x))
      assert(df.filter($"native" =!= $"hof").count() == 0)
    }
  }

  test("null semantics: null array -> null, null elements contribute 0") {
    withFn {
      val df = Seq(
        (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
        (None, Some(Seq(1L))),
        (Some(Seq[Long]()), Some(Seq[Long]()))
      ).toDF("a", "b").withColumn("d", expr("dot_i64(a, b)"))
      val got = df.select($"d").as[Option[Long]].collect().toSeq
      assert(got == Seq(Some(11L), None, Some(0L)))
      val withNullElem = spark.sql(
        "SELECT dot_i64(array(1L, CAST(NULL AS BIGINT), 3L), array(2L, 5L, 10L)) AS d")
      assert(withNullElem.as[Long].head() == 32L)
    }
  }

  test("injected via SparkSessionExtensions: resolves in a fresh session") {
    // newSession() drops temp functions — only the extensions-injected
    // registration can resolve dot_i64 here
    val fresh = spark.newSession()
    val d = fresh.sql("SELECT dot_i64(array(1L, 2L), array(3L, 4L)) AS d")
    assert(d.collect().head.getLong(0) == 11L)
  }

  test("wrong arity fails with the function's NAME, never a raw index error") {
    // both registration paths share one guarded builder list — a
    // one-arg dot_i64 call must fail analysis naming the function and
    // its signature, not throw IndexOutOfBoundsException from exprs(1)
    for (bad <- Seq("dot_i64(array(1L))", "md5_bucket16()",
        "topk_cos(struct(1L, 2L, 3L, 4L), 5, 6)")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT $bad").collect()
      }
      val msgs = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("expects") || msgs.contains("argument"),
        s"$bad -> $msgs")
      assert(!e.isInstanceOf[IndexOutOfBoundsException], s"$bad -> $e")
    }
    // and a Long k outside Int range is REJECTED, never truncated to a
    // different positive k
    val big = intercept[Exception] {
      spark.sql("SELECT topk_cos(struct(1L, 2L, 3L, 4L), 5000000000) FROM VALUES (1)").collect()
    }
    val bigMsgs = Iterator.iterate[Throwable](big)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(bigMsgs.contains("5000000000"), bigMsgs)
  }

  test("stays inside whole-stage codegen over a real scan") {
    withFn {
      val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select($"vec_id",
          transform($"embedding", x => round(x * 100, 0).cast("long")).as("q"))
        .select($"vec_id", expr("dot_i64(q, q)").as("nsq"))
        .filter($"nsq" > 0)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("dot_i64"), p)
      // the stage evaluating dot_i64 is codegen'd ("*(n)" prefix)
      assert(p.linesIterator.exists(l => l.contains("dot_i64") && l.contains("*(")), p)
      assert(!p.contains("ScalaUDF"), p)
    }
  }
}
