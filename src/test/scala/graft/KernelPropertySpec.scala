package graft

import graft.functions.{TopKAgg, VectorExpressions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style tests for the custom kernels — pure expression-level
  * (no Spark jobs), seeded randomness, hundreds of cases in ms. */
class KernelPropertySpec extends AnyFunSuite {

  private def lit(a: Array[Float]): Literal =
    Literal.create(new GenericArrayData(a.map(_.asInstanceOf[Any])),
      ArrayType(FloatType, containsNull = false))

  test("DotProductFloat equals sequential reference fold for random vectors") {
    val rnd = new Random(42)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(65)
      val m = if (rnd.nextInt(5) == 0) rnd.nextInt(65) else n
      val a = Array.fill(n)(rnd.nextFloat() * 200f - 100f)
      val b = Array.fill(m)(rnd.nextFloat() * 200f - 100f)
      val got = VectorExpressions.DotProductFloat(lit(a), lit(b)).eval(null)
      if (n != m) assert(got == null)
      else {
        var ref = 0.0
        for (i <- a.indices) ref += a(i).toDouble * b(i).toDouble
        assert(got == ref)
      }
    }
  }

  test("DotProductFloat: null array -> null; empty arrays -> 0.0") {
    val e = VectorExpressions.DotProductFloat(
      Literal.create(null, ArrayType(FloatType)), lit(Array(1f)))
    assert(e.eval(null) == null)
    assert(VectorExpressions.DotProductFloat(lit(Array.empty[Float]),
      lit(Array.empty[Float])).eval(null) == 0.0)
  }

  test("TopKAgg.Heap keeps exactly the top-k by (value desc, id asc)") {
    val rnd = new Random(7)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(10)
      // duplicate values + colliding ids stress the tie-break path
      val entries = List.fill(rnd.nextInt(60))(
        (rnd.nextInt(20).toDouble, rnd.nextInt(50).toLong))
      val h = new TopKAgg.Heap(k)
      entries.foreach { case (v, id) => h.offer(v, id) }
      val got = h.sortedDescending.toSeq
      val want = entries
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(k)
      assert(got == want, s"k=$k entries=$entries")
    }
  }

  test("TopKAgg heap merge == single-heap over concatenated input") {
    val rnd = new Random(11)
    for (_ <- 1 to 100) {
      val k = 1 + rnd.nextInt(8)
      val xs = List.fill(rnd.nextInt(40))((rnd.nextDouble() * 100, rnd.nextLong(1000)))
      val ys = List.fill(rnd.nextInt(40))((rnd.nextDouble() * 100, rnd.nextLong(1000)))
      val h1 = new TopKAgg.Heap(k); xs.foreach { case (v, i) => h1.offer(v, i) }
      val h2 = new TopKAgg.Heap(k); ys.foreach { case (v, i) => h2.offer(v, i) }
      h2.foreach((v, i) => h1.offer(v, i))
      val ref = new TopKAgg.Heap(k); (xs ++ ys).foreach { case (v, i) => ref.offer(v, i) }
      assert(h1.sortedDescending.toSeq == ref.sortedDescending.toSeq)
    }
  }

  test("TopKAgg serialize/deserialize round trip preserves contents") {
    val agg = TopKAgg(Literal(0.0), Literal(0L), 5)
    val h = new TopKAgg.Heap(5)
    Seq((3.0, 1L), (9.0, 2L), (9.0, 0L), (-2.0, 7L), (5.5, 3L), (8.0, 9L))
      .foreach { case (v, id) => h.offer(v, id) }
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sortedDescending.toSeq == h.sortedDescending.toSeq)
  }

  test("ByteAt reads unsigned bytes, nulls out of range, any integral index type") {
    import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}
    val rnd = new Random(7)
    for (_ <- 1 to 100) {
      val n = 1 + rnd.nextInt(64)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val bin = Literal.create(bytes, BinaryType)
      val i = rnd.nextInt(n + 8) - 4 // includes out-of-range both sides
      val expected: Any = if (i < 0 || i >= n) null else bytes(i) & 0xff
      assert(VectorExpressions.ByteAt(bin, Literal.create(i, IntegerType))
        .eval(null) == expected)
      assert(VectorExpressions.ByteAt(bin, Literal.create(i.toLong, LongType))
        .eval(null) == expected)
    }
    // long index beyond int range -> null, not a wrapped read
    val bin = Literal.create(Array[Byte](1, 2, 3), BinaryType)
    assert(VectorExpressions.ByteAt(bin,
      Literal.create(Int.MaxValue.toLong + 5L, org.apache.spark.sql.types.LongType))
      .eval(null) == null)
  }

  test("SimHash64 is token-order-insensitive and deterministic") {
    def hashOf(ts: Seq[String]): Any =
      VectorExpressions.SimHash64(Literal.create(
        new GenericArrayData(ts.map(UTF8String.fromString)),
        ArrayType(StringType))).eval(null)
    val toks = Seq("spark", "table", "row", "spark")
    assert(hashOf(toks) == hashOf(toks.reverse))
    assert(hashOf(toks) == hashOf(toks))
    assert(hashOf(Seq("spark")) != hashOf(Seq("table")))
  }
}
