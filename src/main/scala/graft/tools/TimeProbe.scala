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
    def time(label: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val n = f
        println(f"$label run$i ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
      }
    // stage A: kernel bands only
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text")).as[(Long, String)]
    time("bands_kernel") {
      docs.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(bs: Array[Byte]): String = { val sb = new StringBuilder(32); bs.foreach(b => sb.append(f"${b & 0xff}%02x")); sb.toString }
        def h(x: String): String = hex(md.digest(x.getBytes("UTF-8")))
        it.flatMap { case (id, text) =>
          val t = text.split(" ", -1)
          val sh = if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq else Seq(t.mkString(" "))
          val hs = sh.map(h)
          val sigs = (0 until 8).map(i => hs.iterator.map(x => x.substring(i) + x.substring(0, i)).min)
          (0 until 4).map { b => (id, b, h(sigs(2*b) + "|" + sigs(2*b+1))) }
        }
      }.toDF("doc_id","band_idx","band_key").count()
    }
    time("q_dedup_minhash_lsh") { graft.SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir).count() }
    time("q_dedup_ngram_jaccard") { graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir).count() }
    spark.stop()
  }
}
