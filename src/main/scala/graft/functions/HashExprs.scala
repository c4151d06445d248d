package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native signature expressions over a pre-hashed `array<long>` token/
  * shingle column. The base xxhash64 pass runs once per element; these
  * expressions then do all K permutations / 64 bit-folds in one codegen'd
  * loop — the interpreted HOF formulation re-walks the array per
  * permutation/bit and dominated the dedup bench.
  */
object HashExprs {

  /** Deterministic affine-permutation constants πᵢ(h) = aᵢ·h + bᵢ (Java
    * long wraparound is part of the permutation — each πᵢ is a bijection
    * because aᵢ is odd).
    */
  private[functions] val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5EED5EEDL)
    Array.fill(64)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  def minhash(hashes: Column, k: Int): Column =
    Bridge.column(MinHashFromHashes(Bridge.expression(hashes), k))

  def simhash(hashes: Column): Column =
    Bridge.column(SimHashFromHashes(Bridge.expression(hashes)))

  def srpBands(emb: Column, dim: Int, bitsPerBand: Int, bands: Int): Column =
    Bridge.column(SrpBandKeys(Bridge.expression(emb), dim, bitsPerBand, bands))
}

/** Sign-random-projection (cosine LSH, Charikar STOC'02) band keys for an
  * `array<float>` embedding: bands×bits fixed Gaussian hyperplanes, one
  * sign bit each, packed into per-band join keys (band index ‖ sign bits).
  * An equi-join on a key collides vectors that agree on a whole band —
  * P(bit match) = 1 − θ/π, so banding trades recall vs candidate volume
  * exactly like MinHash-LSH does for Jaccard. One codegen'd pass; the
  * hyperplanes are seeded constants so keys are reproducible anywhere.
  */
case class SrpBandKeys(child: Expression, dim: Int, bitsPerBand: Int,
    bands: Int) extends UnaryExpression {
  require(bitsPerBand > 0 && bitsPerBand <= 16 && bands > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_keys"

  // flattened (bands*bitsPerBand) × dim Gaussian plane matrix
  private lazy val planes: Array[Double] = {
    val rnd = new scala.util.Random(0x51A9B00CL)
    Array.fill(bands * bitsPerBand * dim)(rnd.nextGaussian())
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var bits = 0L
      var bit = 0
      while (bit < bitsPerBand) {
        val base = (band * bitsPerBand + bit) * dim
        var dot = 0.0
        var k = 0
        while (k < n) { dot += planes(base + k) * arr.getFloat(k); k += 1 }
        if (dot > 0) bits |= 1L << bit
        bit += 1
      }
      out(band) = (band.toLong << bitsPerBand) | bits
      band += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.addReferenceObj("srpPlanes", planes, "double[]")
      val out = ctx.freshName("out")
      val band = ctx.freshName("band")
      val bit = ctx.freshName("bit")
      val bits = ctx.freshName("bits")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($c.numElements(), $dim);
         |long[] $out = new long[$bands];
         |for (int $band = 0; $band < $bands; $band++) {
         |  long $bits = 0L;
         |  for (int $bit = 0; $bit < $bitsPerBand; $bit++) {
         |    int $base = ($band * $bitsPerBand + $bit) * $dim;
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $dot += $p[$base + $k] * $c.getFloat($k);
         |    }
         |    if ($dot > 0) $bits |= 1L << $bit;
         |  }
         |  $out[$band] = ((long) $band << $bitsPerBand) | $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)
}

/** K-slot MinHash signature from base shingle hashes: one pass, K affine
  * permutations per element, running minima.
  */
case class MinHashFromHashes(child: Expression, k: Int)
  extends UnaryExpression {
  require(k > 0 && k <= 64)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  private lazy val as: Array[Long] = HashExprs.perms.take(k).map(_._1)
  private lazy val bs: Array[Long] = HashExprs.perms.take(k).map(_._2)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = h * as(j) + bs(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.addReferenceObj("minhashA", as, "long[]")
      val b = ctx.addReferenceObj("minhashB", bs, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = $h * $a[$j] + $b[$j];
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

/** 64-bit SimHash from term-frequency token hashes: bit j set when the
  * ±1 votes of the tokens' j-th hash bits sum positive.
  */
case class SimHashFromHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Long](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        cnt(j) += ((h >>> j) & 1L) * 2 - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |long[] $cnt = new long[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $cnt[$j] += (($h >>> $j) & 1L) * 2 - 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($cnt[$j] > 0) $out |= 1L << $j;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashFromHashes =
    copy(child = newChild)
}
