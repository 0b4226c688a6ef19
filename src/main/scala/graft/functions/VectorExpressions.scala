package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot per-row loops.
  *
  * The built-in way to fold over an array column is
  * `aggregate`/`zip_with` (higher-order functions) — correct, but each
  * element evaluates a lambda through the interpreter: at 12.5M
  * vector pairs × 64 dims that interpretation dominated the benchmark
  * (embedding_dedup ~108 s at sf0.1). These expressions collapse each
  * loop into one flat JVM kernel.
  *
  * `DotProductFloat` carries real `doGenCode` — it sits inside the
  * pair-scoring loop of brute-force similarity (the single hottest
  * expression in the library) and fuses into whole-stage codegen.
  * The hash-signature expressions (`SimHash64`, `MinHashMd5Sig`)
  * evaluate once per DOCUMENT (not per pair), so a tight `eval` with
  * CodegenFallback already removes >99% of their interpreted cost;
  * fallback there costs one boxed call per row. Both derive their hash
  * families from md5 — bit-identical to a `conv(substring(md5(…)))`
  * SQL formulation — which is what lets C2/C3/E6 hash-gate against
  * DuckDB while keeping the per-row compute in one JVM kernel.
  */
object VectorExpressions {

  /** Dot product of two array<float> columns, double accumulation,
    * sequential fold order. Null semantics are EXACTLY those of the
    * higher-order-function formulation
    * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, +)`:
    * null if either array is null, the lengths differ (zip_with pads
    * with null, which null-poisons the fold), or any slot is null —
    * which makes [[graft.plans.FuseVectorKernels]] an unconditional
    * value-preserving rewrite. The null branch is never taken on dense
    * embedding tables and predicts perfectly. */
  case class DotProductFloat(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_product_float"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Per-thread MD5 instance for [[SimHash64]] — MessageDigest is
    * stateful and not thread-safe, and expression instances may be
    * shared across tasks. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit SimHash of an array<string> token column. Bit b of the
    * result is set iff the majority-weighted sum of token-hash bit b is
    * ≥ 0, over the token MULTISET (each occurrence votes).
    *
    * The per-token hash family is md5-derived: bits 0–31 come from the
    * big-endian uint32 of md5 bytes 0–3 (hex chars 1–8), bits 32–63
    * from bytes 4–7 (hex chars 9–16) — both engines compute md5
    * bit-identically, which makes C3 a HASH-GATED query (same move as
    * C2/C11). The simhash properties are hash-family-agnostic, so a
    * throughput-critical deployment swaps an xxhash64 kernel back in
    * here without changing any other semantics. One pass over the
    * tokens, one MD5 per token (not per bit). */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      val md = md5Local.get()
      var i = 0
      while (i < n) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h1 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((h2 >>> b) & 1L) == 1L) counts(b + 32) += 1 else counts(b + 32) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) >= 0) out |= (1L << b)
        b += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-slot MinHash signature of an array<string> shingle column,
    * md5-derived double hashing (Kirsch–Mitzenmacher): per shingle,
    * h1/h2 = the big-endian 56-bit values of md5 bytes 0–6 and 8–14
    * (= the two 14-hex-char halves the SQL formulation parses via
    * `conv(substring(md5(s), …), 16, 10)`); slot i = min over shingles
    * of h1 + i·h2. BIT-IDENTICAL to that higher-order-function
    * formulation — same oracle — but one MessageDigest call per
    * shingle instead of an md5-hex string parse per (shingle, half),
    * and one flat JVM loop instead of 16 interpreted array_min passes.
    * C2/E6's hot per-document kernel. */
  case class MinHashMd5Sig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_md5_sig"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      val md = md5Local.get()
      var i = 0
      while (i < n) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h1 = 0L; var h2 = 0L
        var j = 0
        while (j < 7) {
          h1 = (h1 << 8) | (d(j) & 0xffL)
          h2 = (h2 << 8) | (d(j + 8) & 0xffL)
          j += 1
        }
        var s = 0
        var h = h1
        while (s < k) {
          if (h < mins(s)) mins(s) = h
          h += h2
          s += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `byte_at(bin, i)` — unsigned value of byte `i` (0-based) of a
    * binary column; null out of range. Replaces the
    * `conv(hex(substring(bin, i+1, 1)), 16, 10)` idiom (three string
    * allocations per byte) with one bounds-checked array read that
    * fuses into whole-stage codegen — the per-pixel primitive under
    * the D2/D4 media decoders' channel folds. Accepts any integral
    * index type (sequence() lambdas produce ints, offset arithmetic
    * may widen to long). */
  case class ByteAt(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "byte_at"

    // reject wrong-typed args at ANALYSIS (a fractional index would
    // otherwise truncate under codegen but MatchError under eval —
    // same query, two behaviors)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      if (left.dataType != BinaryType)
        TypeCheckFailure(s"byte_at requires a BINARY first argument, got ${left.dataType}")
      else right.dataType match {
        case ByteType | ShortType | IntegerType | LongType => TypeCheckSuccess
        case t => TypeCheckFailure(s"byte_at index must be integral, got $t")
      }
    }

    override def nullSafeEval(bin: Any, pos: Any): Any = {
      val b = bin.asInstanceOf[Array[Byte]]
      val i = pos match {
        case x: Int => x
        case x: Long => if (x > Int.MaxValue || x < Int.MinValue) -1 else x.toInt
        case x: Short => x.toInt
        case x: Byte => x.toInt
      }
      if (i < 0 || i >= b.length) null else b(i) & 0xff
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, p) => {
        val idx = ctx.freshName("idx")
        s"""
           |long $idx = (long)($p);
           |if ($idx < 0L || $idx >= (long)($b).length) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ($b)[(int)$idx] & 0xFF;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Rotate an array<float> column by a FIXED orthogonal matrix:
    * y[i] = Σ_j x[j] · mat[j*dim + i] (row-vector × matrix, row-major
    * flat layout), double accumulation per output slot, cast back to
    * float. The matrix is a plan-time literal (an OPQ rotation learned
    * driver-side on a bounded sample — C7i), so each row pays one flat
    * dim² JVM loop with no per-element lambda interpretation; it runs
    * once per VECTOR in the one-time encode pass and once per query in
    * the panel, so CodegenFallback's one boxed call per row is
    * irrelevant (the SimHash64 rationale). Nulls/misfit lengths → null
    * (the DotProductFloat contract). */
  case class RotateFloat(child: Expression, mat: Array[Float], dim: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "rotate_float"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      if (x.numElements() != dim) return null
      val xs = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        if (x.isNullAt(j)) return null
        xs(j) = x.getFloat(j).toDouble
        j += 1
      }
      val y = new Array[Any](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0
        var k = 0
        while (k < dim) {
          s += xs(k) * mat(k * dim + i)
          k += 1
        }
        y(i) = s.toFloat
        i += 1
      }
      new GenericArrayData(y)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Deflate-compressed byte length of a string column (zlib wrapper,
    * the given level) — the C9c compression-ratio quality signal's
    * kernel. Once per DOCUMENT, so CodegenFallback's one boxed call
    * per row is noise next to the deflate itself (SimHash64's
    * argument). The JDK's Deflater wraps the same zlib as CPython's —
    * byte-length parity verified in this container, which is what
    * lets check.py grade the signal EXACTLY cross-engine. A fresh
    * Deflater per row (not thread-local): Deflater holds native
    * state that `end()` must release deterministically. */
  case class DeflateLen(child: Expression, level: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "deflate_len"

    override def nullSafeEval(input: Any): Any = {
      val in = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val d = new java.util.zip.Deflater(level)
      try {
        d.setInput(in)
        d.finish()
        val buf = new Array[Byte](math.max(64, in.length / 2 + 64))
        var total = 0
        while (!d.finished()) total += d.deflate(buf)
        total
      } finally d.end()
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // Column wrappers ----------------------------------------------------

  def deflateLen(s: Column, level: Int = 6): Column =
    GraftShim.column(DeflateLen(GraftShim.expression(s), level))

  def dotF(a: Column, b: Column): Column =
    GraftShim.column(DotProductFloat(
      GraftShim.expression(a), GraftShim.expression(b)))

  def rotateF(x: Column, mat: Array[Float], dim: Int): Column =
    GraftShim.column(RotateFloat(GraftShim.expression(x), mat, dim))

  def simhash64(tokens: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens)))

  def minhashMd5Sig(shingles: Column, k: Int): Column =
    GraftShim.column(MinHashMd5Sig(GraftShim.expression(shingles), k))

  /** Deterministic random-hyperplane weights for LSH, computed
    * driver-side once — the plan embeds the planes as literals, no
    * per-row hashing, reproducible on any cluster.
    *
    * Weight (p, j) = (BE32(md5("p:j")[0..3]) % 1000) / 1000 − 0.5 as
    * float32 — md5-derived like the C2/C3/C11 hash families, so an
    * oracle can rebuild the identical planes in SQL
    * (`CAST(('0x' || substr(md5(p || ':' || j), 1, 8)) AS BIGINT)`),
    * which is what upgrades C7 to a hash-gated query. Sign-LSH theory
    * only needs symmetric iid-ish weights; the family is swappable. */
  def hyperplane(p: Int, dims: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { j =>
      md.reset()
      val d = md.digest(s"$p:$j".getBytes("UTF-8"))
      val m = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      ((m % 1000L).toDouble / 1000.0 - 0.5).toFloat
    }
  }
}
