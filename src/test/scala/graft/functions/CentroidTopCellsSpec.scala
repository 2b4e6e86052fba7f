package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CentroidTopCellsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Naive reference: score every centroid, sort (cos DESC with NaN
    * greatest, id ASC), take m. */
  private def ref(v: Array[Long], cents: Seq[(Long, Seq[Long], Double)],
                  m: Int): Seq[Long] = {
    val n2 = v.map(x => x * x).sum
    val base = math.sqrt(n2.toDouble)
    cents.map { case (id, cv, sn) =>
      val d = v.zip(cv).map { case (a, b) => a * b }.sum
      (d.toDouble / (base * sn), id)
    }.sortWith { case ((c1, i1), (c2, i2)) =>
      val cmp = java.lang.Double.compare(c1, c2)
      if (cmp != 0) cmp > 0 else i1 < i2
    }.take(m).map(_._2)
  }

  private def mkCents(vecs: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long], Double)] =
    vecs.map { case (id, v) =>
      (id, v, math.sqrt(v.map(x => x * x).sum.toDouble))
    }

  test("matches the naive reference on random vectors, all m") {
    val rnd = new scala.util.Random(31)
    val dim = 16
    val cents = mkCents((0L until 20L).map(i =>
      (i * 3, Seq.fill(dim)(rnd.nextLong() % 1000))))
    val rows = (0 until 100).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextLong() % 1000)))
    for (m <- Seq(1, 2, 5, 25)) {
      val got = rows.toDF("id", "v")
        .select(col("id"), CentroidTopCells.topCells(col("v"), cents, m).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      rows.foreach { case (id, v) =>
        assert(got(id) == ref(v, cents, m), s"m=$m id=$id")
      }
    }
  }

  test("zero vector (NaN cosines) is deterministic and matches reference") {
    val cents = mkCents(Seq((5L, Seq(1L, 2L)), (3L, Seq(2L, 1L)), (9L, Seq(0L, 0L))))
    val got = Seq((1L, Array(0L, 0L))).toDF("id", "v")
      .select(CentroidTopCells.topCells(col("v"), cents, 2).as("cells"))
      .collect().head.getSeq[Long](0).toSeq
    assert(got == ref(Array(0L, 0L), cents, 2))
  }

  test("cosine ties break to the smaller cent_id") {
    // identical centroids under different ids -> identical cosines
    val cents = mkCents(Seq((7L, Seq(1L, 1L)), (2L, Seq(1L, 1L)), (4L, Seq(1L, 1L))))
    val got = Seq((1L, Array(3L, 3L))).toDF("id", "v")
      .select(CentroidTopCells.topCells(col("v"), cents, 2).as("cells"))
      .collect().head.getSeq[Long](0).toSeq
    assert(got == Seq(2L, 4L))
  }

  test("interpreted eval matches codegen") {
    val cents = mkCents(Seq((1L, Seq(5L, 0L)), (2L, Seq(0L, 5L))))
    val e = CentroidTopCells(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3L, 4L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      cents.map(_._1).toIndexedSeq, cents.map(_._2.toIndexedSeq).toIndexedSeq,
      cents.map(_._3).toIndexedSeq, 2)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(got.toLongArray().toSeq == ref(Array(3L, 4L), cents, 2))
  }
}
