package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Nearest-candidate argbest expressions over a SMALL, driver-resident
  * candidate matrix (IVF centroids, PQ codebooks — dimension-sized by
  * construction, a few hundred rows).
  *
  * The DataFrame formulation of "assign each row to its nearest candidate"
  * is `row × broadcast(candidates)` cross-expansion followed by a
  * `groupBy(row_key).agg(max_by/min_struct)` — the expansion multiplies
  * row count by the candidate count and the aggregation shuffles it back
  * down, purely to express a per-row argmax (guide §2.4: an Exchange that
  * computes nothing). These expressions fold the whole candidate scan
  * into ONE codegen'd map-side loop per row: no row expansion, no
  * aggregation exchange, cost identical at any corpus size (the candidate
  * matrix rides the closure exactly like a broadcast hash relation).
  *
  * Arithmetic parity with the join formulation: dot products widen floats
  * to double and fold left-to-right over min(len) elements — byte-for-byte
  * [[FloatVectorDot]] — and candidates are scanned in ascending id order
  * with strict-improvement replacement, reproducing the join's
  * deterministic tie-breaks (max_by keeps the first maximum in build-row
  * order = ascending id; min(struct(d2, code)) keeps the lowest code).
  */
object NearestIdx {

  /** Short stable content digest for plan rendering. */
  private def tag(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Id of the candidate maximizing dot(v, c_i) / (nrm · cnorm_i),
    * scanned in ascending-id order (`ids` sorted). `cents` is row-major
    * k×dim. A row whose scores are all NaN (zero-norm vector) resolves to
    * the first candidate — the same "first build row wins" outcome the
    * max_by join produced.
    */
  case class ArgMaxCosine(left: Expression, right: Expression,
      ids: Array[Long], cents: Array[Float], cnorms: Array[Double], dim: Int)
    extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "argmax_cosine"

    // stable rendering: the default product toString prints the array
    // references' identity hashCodes, which differ per JVM and would ride
    // the bench's plan-fingerprint ledger; render a CONTENT digest
    // instead so identical candidate matrices canonicalize identically
    private lazy val contentTag: String = NearestIdx.tag(
      ids.mkString(",") + "|" + cents.mkString(",") + "|" + cnorms.mkString(","))
    override def toString: String =
      s"argmax_cosine($left, $right, k=${ids.length}, dim=$dim, $contentTag)"

    private def k: Int = cnorms.length

    override def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val na = b.asInstanceOf[Double]
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val off = c * dim
        val n = math.min(dim, v.numElements())
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += v.getFloat(j).toDouble * cents(off + j).toDouble
          j += 1
        }
        val score = dot / (na * cnorms(c))
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      ids(if (best < 0) 0 else best)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, na) => {
        val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
        val centsRef = ctx.addReferenceObj("cents", cents, "float[]")
        val normsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val score = ctx.freshName("score")
        val best = ctx.freshName("best")
        val bestScore = ctx.freshName("bestScore")
        val off = ctx.freshName("off")
        s"""
           |int $best = -1;
           |double $bestScore = Double.NEGATIVE_INFINITY;
           |int $n = java.lang.Math.min($dim, $a.numElements());
           |for (int $c = 0; $c < $k; $c++) {
           |  int $off = $c * $dim;
           |  double $dot = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $dot += (double) $a.getFloat($j) * (double) $centsRef[$off + $j];
           |  }
           |  double $score = $dot / ($na * $normsRef[$c]);
           |  if ($score > $bestScore) { $bestScore = $score; $best = $c; }
           |}
           |${ev.value} = $idsRef[$best < 0 ? 0 : $best];
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArgMaxCosine =
      copy(left = newLeft, right = newRight)
  }

  /** Nearest-centroid id: scans centroids in ascending `ids` order and
    * returns the winner's id (LongType, matching the IVF c_id column).
    */
  def nearestCentroidId(emb: Column, nrm: Column,
      ids: Array[Long], cents: Array[Float], cnorms: Array[Double],
      dim: Int): Column =
    Bridge.column(ArgMaxCosine(Bridge.expression(emb), Bridge.expression(nrm),
      ids, cents, cnorms, dim))

  /** Per-subspace nearest-codeword code: candidates for subspace `m` are
    * `entries` rows [offsets(m), offsets(m+1)); d2 = cwn2 − 2·dot(sv, cw)
    * (the |sv|²-free argmin form), strict-less replacement in ascending
    * code order = min(struct(d2, code)).
    */
  case class ArgMinD2Sub(left: Expression, right: Expression,
      offsets: Array[Int], codes: Array[Int],
      cws: Array[Float], cwn2: Array[Double], subDim: Int)
    extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "argmin_d2_sub"

    // see ArgMaxCosine.toString — content digest, not array identities
    private lazy val contentTag: String = NearestIdx.tag(
      offsets.mkString(",") + "|" + codes.mkString(",") + "|" +
        cws.mkString(",") + "|" + cwn2.mkString(","))
    override def toString: String =
      s"argmin_d2_sub($left, $right, n=${codes.length}, subDim=$subDim, $contentTag)"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val sv = a.asInstanceOf[ArrayData]
      val m = b.asInstanceOf[Int]
      var best = 0
      var bestD2 = Double.PositiveInfinity
      var e = offsets(m)
      val end = offsets(m + 1)
      while (e < end) {
        val off = e * subDim
        val n = math.min(subDim, sv.numElements())
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += sv.getFloat(j).toDouble * cws(off + j).toDouble
          j += 1
        }
        val d2 = cwn2(e) - 2.0 * dot
        if (d2 < bestD2) { bestD2 = d2; best = codes(e) }
        e += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, m) => {
        val offRef = ctx.addReferenceObj("offsets", offsets, "int[]")
        val codeRef = ctx.addReferenceObj("codes", codes, "int[]")
        val cwsRef = ctx.addReferenceObj("cws", cws, "float[]")
        val n2Ref = ctx.addReferenceObj("cwn2", cwn2, "double[]")
        val e = ctx.freshName("e")
        val end = ctx.freshName("end")
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val d2v = ctx.freshName("d2v")
        val best = ctx.freshName("best")
        val bestD2 = ctx.freshName("bestD2")
        val off = ctx.freshName("off")
        s"""
           |int $best = 0;
           |double $bestD2 = Double.POSITIVE_INFINITY;
           |int $n = java.lang.Math.min($subDim, $a.numElements());
           |int $end = $offRef[$m + 1];
           |for (int $e = $offRef[$m]; $e < $end; $e++) {
           |  int $off = $e * $subDim;
           |  double $dot = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $dot += (double) $a.getFloat($j) * (double) $cwsRef[$off + $j];
           |  }
           |  double $d2v = $n2Ref[$e] - 2.0 * $dot;
           |  if ($d2v < $bestD2) { $bestD2 = $d2v; $best = $codeRef[$e]; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArgMinD2Sub =
      copy(left = newLeft, right = newRight)
  }

  def nearestCode(sv: Column, m: Column, offsets: Array[Int],
      codes: Array[Int], cws: Array[Float], cwn2: Array[Double],
      subDim: Int): Column =
    Bridge.column(ArgMinD2Sub(Bridge.expression(sv), Bridge.expression(m),
      offsets, codes, cws, cwn2, subDim))
}
