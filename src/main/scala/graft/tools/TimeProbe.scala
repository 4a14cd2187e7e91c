package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    // native kernel variant of embedding cosine
    def nativeCosine(): Long = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => round(x * 100, 0).cast("long")).as("q"))
        .as[(Long, Int, Array[Long])]
      val pairs = e.toDF("vec_id","label","q").as("a")
        .join(e.toDF("vec_id","label","q").as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"), col("a.q"), col("b.q"))
        .as[(Long, Long, Array[Long], Array[Long])]
      pairs.mapPartitions { it =>
        it.flatMap { case (va, vb, qa, qb) =>
          var dot = 0L; var na = 0L; var nb = 0L; var i = 0
          while (i < qa.length) { dot += qa(i)*qb(i); na += qa(i)*qa(i); nb += qb(i)*qb(i); i += 1 }
          if (dot > 0 && dot*dot*100 >= 9*na*nb)
            Some((va, vb, math.round(dot / math.sqrt(na.toDouble*nb.toDouble) * 10000) / 10000.0))
          else None
        }
      }.count()
    }
    for (i <- 1 to 2) {
      val t0 = System.nanoTime(); val n = nativeCosine()
      println(f"native_cosine run$i ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    for (n <- Seq("q_dedup_embedding_cosine","q_ann_bruteforce_topk","q_ann_ivf_topk"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"$n run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
