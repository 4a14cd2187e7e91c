package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Algebraic contract of the PQ pieces, independent of any query:
  * ADC-by-lookup must equal the dot product against the explicit
  * reconstruction, the stored norm must equal the reconstruction's
  * norm, and training must be idempotent (frozen-quantizer property).
  */
class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int) = {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Seq.fill(ProductQuantizer.Dims)((rnd.nextInt(19) - 9).toLong))
    }.toDF("vec_id", "q")
      .withColumn("q", $"q".cast("array<long>"))
      .withColumn("nsq", expr("dot_i64(q, q)"))
  }

  test("ADC table lookup ≡ dot against the explicit PQ reconstruction; npq ≡ its norm") {
    val e = corpus(31, 200).localCheckpoint()
    val cb = ProductQuantizer.train(e)
    val rows = e.withColumn("codes", ProductQuantizer.codesCol)
      .withColumn("npq", ProductQuantizer.npqCol(cb))
      .select($"vec_id", $"q", $"codes", $"npq")
      .as[(Long, Array[Long], Array[Int], Long)].collect()
    assert(rows.length == 200)
    assert(rows.forall(_._3.length == ProductQuantizer.M))
    assert(rows.forall(_._3.forall(c => c >= 0 && c < ProductQuantizer.CodebookSize)))

    // explicit reconstruction: concatenate the coded entries
    def recon(codes: Array[Int]): Array[Long] =
      codes.zipWithIndex.flatMap { case (c, m) => cb.ent(m)(c) }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum

    val query = rows.head._2
    val adc = ProductQuantizer.adcTable(query, cb)
    rows.foreach { case (_, _, codes, npq) =>
      val r = recon(codes)
      // npq stored at encode time = |reconstruction|² (orthogonal subspaces)
      assert(npq == dot(r, r))
      // the M lookups sum to the full asymmetric dot — the whole point
      // of ADC: scoring touches only the code, never the vector
      val viaLookup = codes.zipWithIndex.map { case (c, m) => adc(m)(c) }.sum
      assert(viaLookup == dot(query, r))
    }
  }

  test("residual algebra: npqResidualCol ≡ |mc + reconstruction|²; codesColOf ≡ codesCol") {
    val e = corpus(33, 200).localCheckpoint()
    // an arbitrary integer "cluster mean" per row (two fake clusters) —
    // the algebra must hold for ANY mc, not just real means
    val rnd = new scala.util.Random(77)
    val mcs = IndexedSeq.fill(2)(
      Seq.fill(ProductQuantizer.Dims)((rnd.nextInt(7) - 3).toLong))
    val withMc = e
      .withColumn("mc", when($"vec_id" % 2 === 0, typedLit(mcs(0)))
        .otherwise(typedLit(mcs(1))))
      .withColumn("qr", expr("zip_with(q, mc, (a, b) -> a - b)"))
    val cb = ProductQuantizer.train(
      withMc.select($"vec_id", $"qr".as("q"))
        .withColumn("nsq", expr("dot_i64(q, q)")))

    // codesColOf over the residual column ≡ codesCol over a frame where
    // the residual IS the q column (same expression, different home)
    val viaOf = withMc.withColumn("codes", ProductQuantizer.codesColOf("qr"))
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val viaQ = withMc.select($"vec_id", $"qr".as("q"))
      .withColumn("codes", ProductQuantizer.codesCol)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(viaOf == viaQ)

    // npqResidualCol ≡ dot of the explicit (mc + concatenated-entries)
    // reconstruction with itself
    val rows = withMc
      .withColumn("codes", ProductQuantizer.codesColOf("qr"))
      .withColumn("npq", ProductQuantizer.npqResidualCol(cb))
      .select($"vec_id", $"mc", $"codes", $"npq")
      .as[(Long, Array[Long], Array[Int], Long)].collect()
    assert(rows.length == 200)
    rows.foreach { case (_, mc, codes, npq) =>
      val vhat = codes.zipWithIndex.flatMap { case (c, m) => cb.ent(m)(c) }
        .zip(mc).map { case (r, m) => m + r }
      assert(npq == vhat.map(x => x * x).sum)
    }
  }

  test("training is deterministic and idempotent; every emitted code has an entry") {
    val e = corpus(32, 150).localCheckpoint()
    val a = ProductQuantizer.train(e)
    val b = ProductQuantizer.train(e)
    assert(a.entNsq.map(_.toSeq).toSeq == b.entNsq.map(_.toSeq).toSeq)
    assert(a.ent.flatten.map(_.toSeq).toSeq == b.ent.flatten.map(_.toSeq).toSeq)
    // each vector's cell contains at least itself, so its entry is real:
    // a member subvector, never the zero filler
    val codes = e.withColumn("codes", ProductQuantizer.codesCol)
      .select($"codes").as[Array[Int]].collect()
    codes.foreach(_.zipWithIndex.foreach { case (c, m) =>
      assert(a.entNsq(m)(c) > 0 || a.ent(m)(c).exists(_ != 0) ||
        // a genuinely all-zero subvector is its own valid entry
        e.filter(expr(s"dot_i64(slice(q, ${m * ProductQuantizer.SubDims + 1}, ${ProductQuantizer.SubDims}), slice(q, ${m * ProductQuantizer.SubDims + 1}, ${ProductQuantizer.SubDims})) = 0")).count() > 0)
    })
  }
}
