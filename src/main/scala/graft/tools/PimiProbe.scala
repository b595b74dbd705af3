package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Driver-side decomposition of product-IMI serving recall (round 9
  * diagnostic): replays the 4×4 product-grid geometry in plain Scala over
  * the collected sf embeddings and measures recall@3 for several frontier
  * policies, so the recall loss can be ATTRIBUTED (frontier too narrow vs
  * frontier mis-ranked vs cells fundamentally misaligned) before touching
  * the serving expression. Not part of the declared surface.
  */
object PimiProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Tables.t(spark, sf, "embeddings")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val dim = rows.head._2.length
    val dimA = dim / 2
    val kSide = 4
    val nQ = 5
    val topK = 3
    val nProbe = 4

    // ---- training: per-half seeds -> argmin assign -> one quantized Lloyd
    def d2q(x: Array[Float], off: Int, c: Array[Double]): Long = {
      var acc = 0.0; var i = 0
      while (i < c.length) {
        val d = x(off + i).toDouble - c(i); acc += d * d; i += 1
      }
      math.floor(acc * 1e12).toLong
    }
    def argmin(x: Array[Float], off: Int, cb: Array[Array[Double]]): Int = {
      var best = Long.MaxValue; var bc = 0; var k = 0
      while (k < cb.length) {
        val q = d2q(x, off, cb(k)); if (q < best) { best = q; bc = k }; k += 1
      }
      bc
    }
    def lloyd(off: Int, len: Int, seed: Array[Array[Double]]): Array[Array[Double]] = {
      val sums = Array.fill(kSide, len)(0L); val cnt = new Array[Long](kSide)
      rows.foreach { case (_, x) =>
        val c = argmin(x, off, seed)
        cnt(c) += 1
        var i = 0
        while (i < len) {
          sums(c)(i) += math.floor(x(off + i) * 1e6 + 0.5).toLong; i += 1
        }
      }
      Array.tabulate(kSide) { c =>
        if (cnt(c) == 0) seed(c)
        else Array.tabulate(len)(i =>
          ((sums(c)(i).toDouble / 1e6 / cnt(c)).toFloat).toDouble)
      }
    }
    val aSeed = Array.tabulate(kSide)(i => rows(i)._2.take(dimA).map(_.toDouble))
    val bSeed = Array.tabulate(kSide)(i => rows(i)._2.drop(dimA).map(_.toDouble))
    val aCb = lloyd(0, dimA, aSeed)
    val bCb = lloyd(dimA, dim - dimA, bSeed)

    val asg: Map[Long, Int] = rows.map { case (id, x) =>
      id -> (argmin(x, 0, aCb) * kSide + argmin(x, dimA, bCb))
    }.toMap

    def cosQ(x: Array[Float], y: Array[Float]): Long = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < dim) {
        val a = x(i).toDouble; val b = y(i).toDouble
        dot += a * b; nx += a * a; ny += b * b; i += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      val c = if (den == 0.0) 0.0 else dot / den
      math.floor(c * 1e12).toLong
    }
    val queries = rows.take(nQ)
    val brute: Map[Long, Seq[Long]] = queries.map { case (qid, qx) =>
      qid -> rows.filter(_._1 != qid)
        .map { case (nid, nx) => (nid, cosQ(qx, nx)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(topK).map(_._1).toSeq
    }.toMap

    // centroid of cell c (reconstructed), its cosine rank vs a query
    val cents: Array[Array[Double]] = Array.tabulate(kSide * kSide) { c =>
      aCb(c / kSide) ++ bCb(c % kSide)
    }
    def cosQd(x: Array[Float], y: Array[Double]): Long = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < dim) {
        val a = x(i).toDouble; val b = y(i)
        dot += a * b; nx += a * a; ny += b * b; i += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      val c = if (den == 0.0) 0.0 else dot / den
      math.floor(c * 1e12).toLong
    }

    def frontier(qx: Array[Float], pSide: Int): Seq[Int] = {
      def best(off: Int, cb: Array[Array[Double]]): Seq[Int] =
        cb.indices.map(k => (d2q(qx, off, cb(k)), k)).sorted.take(pSide).map(_._2)
      for (i <- best(0, aCb); j <- best(dimA, bCb)) yield i * kSide + j
    }

    def recallOf(cellsOf: Array[Float] => Seq[Int]): Double = {
      val hits = queries.map { case (qid, qx) =>
        val cells = cellsOf(qx).toSet
        val cand = rows.filter { case (nid, _) => nid != qid && cells(asg(nid)) }
          .map { case (nid, nx) => (nid, cosQ(qx, nx)) }
          .sortBy { case (nid, c) => (-c, nid) }.take(topK).map(_._1).toSet
        brute(qid).count(cand).toDouble
      }.sum
      hits / (nQ * topK)
    }

    // where do the brute neighbors actually live (cell cosine rank)?
    queries.foreach { case (qid, qx) =>
      val order = cents.indices.sortBy(c => (-cosQd(qx, cents(c)), c))
      val rankOf = order.zipWithIndex.toMap
      val qCell = asg(qid)
      val info = brute(qid).map { nid =>
        s"$nid cell=${asg(nid)} cosRank=${rankOf(asg(nid))}"
      }.mkString("; ")
      println(s"q$qid cell=$qCell -> $info")
    }

    def show(name: String, r: Double): Unit = println(f"$name: $r%.3f")
    show("L2-sum frontier p3 top4 (r8 shipped)", recallOf { qx =>
      frontier(qx, 3).map(c => (c, c)).sortBy(_._1).take(0) // placeholder
      // rank 3x3 frontier by half-L2 sum
      val f = {
        def best(off: Int, cb: Array[Array[Double]]): Seq[(Long, Int)] =
          cb.indices.map(k => (d2q(qx, off, cb(k)), k)).sorted.take(3)
        for (a <- best(0, aCb); b <- best(dimA, bCb))
          yield (a._1 + b._1, a._2 * kSide + b._2)
      }
      f.sorted.take(nProbe).map(_._2)
    })
    show("cos-rescored frontier p3 top4 (r9 fix)", recallOf { qx =>
      frontier(qx, 3).map(c => (-cosQd(qx, cents(c)), c)).sorted
        .take(nProbe).map(_._2)
    })
    show("cos over FULL grid top4 (IVF-equiv)", recallOf { qx =>
      cents.indices.map(c => (-cosQd(qx, cents(c)), c)).sorted
        .take(nProbe).map(_._2)
    })
    show("cos-rescored frontier p4=full", recallOf { qx =>
      frontier(qx, 4).map(c => (-cosQd(qx, cents(c)), c)).sorted
        .take(nProbe).map(_._2)
    })
    show("L2-sum full grid top4", recallOf { qx =>
      val f = {
        def best(off: Int, cb: Array[Array[Double]]): Seq[(Long, Int)] =
          cb.indices.map(k => (d2q(qx, off, cb(k)), k)).sorted
        for (a <- best(0, aCb); b <- best(dimA, bCb))
          yield (a._1 + b._1, a._2 * kSide + b._2)
      }
      f.sorted.take(nProbe).map(_._2)
    })
    show("cos frontier p3 top6", recallOf { qx =>
      frontier(qx, 3).map(c => (-cosQd(qx, cents(c)), c)).sorted
        .take(6).map(_._2)
    })
    spark.stop()
  }
}
