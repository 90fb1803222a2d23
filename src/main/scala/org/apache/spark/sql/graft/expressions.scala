package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with `doGenCode`) for the hot vector/text
  * paths. Spark's higher-order functions (aggregate/zip_with/transform) are
  * interpreted per element with boxing; these compile to tight Java loops
  * inside WholeStageCodegen — the Spark-native equivalent of the reference
  * engine's vectorized kernels.
  */

/** cosine(a, b) over two double arrays, single pass, sequential
  * accumulation (index order — same result as the HOF formulation and the
  * DuckDB oracle, just ~10× faster).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) over two double arrays — the MIPS scoring kernel (two-tower
  * retrieval ranks by raw inner product, NOT cosine: vector norm carries
  * popularity/confidence signal that normalizing destroys). Same
  * single-pass sequential accumulation as [[CosineSimilarity]] (index
  * order — matches the HOF formulation and DuckDB's list_inner_product).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ(a−b)² over two `array<bigint>` columns — the integer squared-L2
  * kernel of the deterministic IVF quantizer (round 15): the beam descent
  * evaluates one distance per (vector, candidate cell) per level, and the
  * HOF formulation (`aggregate(zip_with(...))`) paid ~dims interpreted
  * boxed lambda calls per distance — measured as the dominant term of the
  * 2M-vector quantizer build. Exact BIGINT arithmetic, same accumulation
  * order as the HOF and the DuckDB oracle's SUM((xi−cq)²): bit-identical
  * results, one tight loop.
  */
case class IntSquaredL2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two `array<bigint>` columns — the exact integer dot
  * product behind the graph family's signed-squared-cosine buckets
  * (emb_cosine_hist, graph_sssp edge weights): the HOF formulation
  * (`aggregate(zip_with(...))`) pays ~dims interpreted boxed lambda calls
  * per edge — the same cost profile [[IntSquaredL2]] was built to remove
  * from the quantizer build (round 15). Exact BIGINT arithmetic, same
  * sequential accumulation order as the HOF and the oracle's
  * SUM(xu.xi * xv.xi): bit-identical results, one tight loop.
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit polynomial rolling hash (base 1000003, mod 2^64) over UTF-8
  * bytes — a content fingerprint cheaper than md5 with a one-multiplication
  * per-byte loop.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1000003L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of token strings: token hash = the same
  * polynomial hash as [[RollingHash]]; bit i of the result is the sign of
  * Σ_tokens (±1 by token-hash bit i). One pass over tokens, 64 counters.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var w = 0
    while (w < arr.numElements()) {
      if (!arr.isNullAt(w)) {
        val bytes = arr.getUTF8String(w).getBytes
        var h = 0L
        var i = 0
        while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val w = ctx.freshName("w")
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[64];
         |for (int $w = 0; $w < $c.numElements(); $w++) {
         |  if (!$c.isNullAt($w)) {
         |    byte[] $bytes = $c.getUTF8String($w).getBytes();
         |    long $h = 0L;
         |    for (int $i = 0; $i < $bytes.length; $i++) {
         |      $h = $h * 1000003L + ($bytes[$i] & 0xffL);
         |    }
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counts[$b] += (((($h >>> $b) & 1L) == 1L) ? 1 : -1);
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nPerms`-element MinHash signature of a token array in one pass: each
  * token gets two independent 64-bit polynomial hashes (h1, h2);
  * permutation j is approximated as h1 + j*h2 (Carter–Wegman), so the
  * per-token cost is two byte-loops + nPerms adds instead of nPerms full
  * string hashes. The default 64 perms band as 16×4; a SECOND independent
  * band family (round 16 — the r15 designed-miss item) is permutations
  * 64..127 of the SAME construction: prefix-compatible, so sig[0..63] of
  * a 128-perm signature is bit-identical to the 64-perm signature.
  */
case class MinHashSignature(child: Expression, nPerms: Int = 64)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(nPerms)(Long.MaxValue)
    var w = 0
    while (w < arr.numElements()) {
      if (!arr.isNullAt(w)) {
        val bytes = arr.getUTF8String(w).getBytes
        var h1 = 0L
        var h2 = 1469598103934665603L
        var i = 0
        while (i < bytes.length) {
          h1 = h1 * 1000003L + (bytes(i) & 0xffL)
          h2 = (h2 ^ (bytes(i) & 0xffL)) * 1099511628211L
          i += 1
        }
        var j = 0
        var hj = h1
        while (j < nPerms) {
          if (hj < sig(j)) sig(j) = hj
          hj += h2
          j += 1
        }
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val w = ctx.freshName("w")
      val bytes = ctx.freshName("bytes")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hj = ctx.freshName("hj")
      s"""
         |long[] $sig = new long[$nPerms];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $w = 0; $w < $c.numElements(); $w++) {
         |  if (!$c.isNullAt($w)) {
         |    byte[] $bytes = $c.getUTF8String($w).getBytes();
         |    long $h1 = 0L; long $h2 = 1469598103934665603L;
         |    for (int $i = 0; $i < $bytes.length; $i++) {
         |      $h1 = $h1 * 1000003L + ($bytes[$i] & 0xffL);
         |      $h2 = ($h2 ^ ($bytes[$i] & 0xffL)) * 1099511628211L;
         |    }
         |    long $hj = $h1;
         |    for (int $j = 0; $j < $nPerms; $j++) {
         |      if ($hj < $sig[$j]) $sig[$j] = $hj;
         |      $hj += $h2;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| for two ASCENDING-sorted long arrays via a merge walk — O(n+m)
  * with zero allocation; the fast path for set-similarity verification when
  * elements are pre-hashed and pre-sorted once per row.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $n++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket ids, all tables in one pass: output[t] =
  * Σ_j (dot(emb, plane[t*planesPerTable+j]) > 0) << j for t < nTables.
  * `planes` is a flat row-major (table*planesPerTable+j)*dim array baked in
  * as a codegen reference object — the interpreted HOF formulation
  * (transform + aggregate + zip_with) evaluates ~nTables×planesPerTable×dim
  * boxed lambdas per row; this is one tight loop nest inside
  * WholeStageCodegen.
  *
  * `planes` is a Seq (not Array) so case-class equality is structural —
  * Array's identity equals/hashCode would defeat canonicalization /
  * semanticEquals / common-subexpression elimination (round-3 advice).
  */
case class HyperplaneBuckets(child: Expression, planes: Seq[Double],
    nTables: Int, planesPerTable: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private val dim: Int = planes.length / (nTables * planesPerTable)
  require(planes.length == nTables * planesPerTable * dim,
    "planes length must be nTables * planesPerTable * dim")
  // hot-path/codegen view of the planes; the Seq stays the equality carrier
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < planesPerTable) {
        val base = (t * planesPerTable + j) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += x.getDouble(i) * planesArr(base + i); i += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($c.numElements(), $dim);
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $planesPerTable; $j++) {
         |    int $base = ($t * $planesPerTable + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $c.getDouble($i) * $planesRef[$base + $i];
         |    }
         |    if ($dot > 0) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy longest-match subword tokenizer over an ASCII vocab — the
  * engine-side seam for BPE-consistent token accounting (round-4 verdict:
  * "a vocab-file driven greedy BPE"). Real learned-merge BPE applies merge
  * rules iteratively; the industry-standard fast path (WordPiece /
  * SentencePiece greedy) is longest-prefix match over the merged vocab,
  * which is what this implements — deterministic, one pass, O(text ·
  * candidates-per-first-char).
  *
  * Positions advance in CODEPOINTS (one fallback token per unmatched
  * codepoint), matching ANSI-SQL character semantics so the DuckDB oracle
  * can replay the walk exactly; the vocab is required ASCII, where UTF-16
  * char indexing and codepoint indexing agree on every possible match.
  */
class BpeMatcher(val vocab: Array[String]) extends Serializable {
  require(vocab.forall(t => t.nonEmpty && t.forall(_ < 128)),
    "BPE vocab must be non-empty ASCII tokens")

  // candidates bucketed by first char, longest first → the first region
  // match IS the longest match
  @transient private lazy val byChar: Array[Array[String]] = {
    val buckets = Array.fill(128)(List.empty[String])
    vocab.foreach(t => buckets(t.charAt(0)) ::= t)
    buckets.map(_.sortBy(-_.length).toArray)
  }

  /** [n_tokens, n_fallback] of the greedy walk over `s`. */
  def stats(s: String): Array[Long] = {
    var pos = 0
    var ntok = 0L
    var nfb = 0L
    while (pos < s.length) {
      val c = s.charAt(pos)
      var len = 0
      if (c < 128) {
        val cands = byChar(c)
        var i = 0
        while (i < cands.length && len == 0) {
          if (s.startsWith(cands(i), pos)) len = cands(i).length
          i += 1
        }
      }
      ntok += 1
      if (len == 0) {
        nfb += 1
        pos += Character.charCount(s.codePointAt(pos))
      } else pos += len
    }
    Array(ntok, nfb)
  }
}

/** Token statistics of the greedy subword walk: output = [n_tokens,
  * n_fallback]. The matcher (with its prebuilt candidate index) rides into
  * generated code as a codegen reference object; `vocab` stays the
  * structural-equality carrier (same lesson as [[HyperplaneBuckets]]).
  */
case class BpeTokenStats(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val matcher = new BpeMatcher(vocab.toArray)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_token_stats"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      matcher.stats(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMatcher", matcher, classOf[BpeMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $m.stats($c.toString()));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct 64-bit hashes of all character n-grams of a string —
  * the shingle-set builder for n-gram Jaccard, fused into one codegen pass
  * (hash windows over the raw UTF-8 bytes, sort, dedup in place) instead of
  * an interpreted transform + substring + hash + array_distinct + sort
  * chain.
  */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val count = math.max(bytes.length - n + 1, 0)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0L
      var k = 0
      while (k < n) { h = h * 1000003L + (bytes(i + k) & 0xffL); k += 1 }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    var j = 0
    while (j < count) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(out) = hs(j); out += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(hs, out))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val count = ctx.freshName("count")
      val hs = ctx.freshName("hs")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $count = Math.max($bytes.length - $n + 1, 0);
         |long[] $hs = new long[$count];
         |for (int $i = 0; $i < $count; $i++) {
         |  long $h = 0L;
         |  for (int $k = 0; $k < $n; $k++) { $h = $h * 1000003L + ($bytes[$i + $k] & 0xffL); }
         |  $hs[$i] = $h;
         |}
         |java.util.Arrays.sort($hs);
         |int $out = 0;
         |for (int $j = 0; $j < $count; $j++) {
         |  if ($j == 0 || $hs[$j] != $hs[$j - 1]) { $hs[$out] = $hs[$j]; $out++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($hs, $out));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunk boundaries via a Gear rolling hash — the CDC
  * primitive behind storage dedup and shift-robust training-data dedup:
  * unlike fixed-size chunks, boundaries follow CONTENT (`h mod 64 == 0`),
  * so an insertion early in a document only re-chunks its neighborhood.
  * Returns the 1-based exclusive END offsets of each chunk in CODE POINTS
  * (the unit both Spark's `substring` and DuckDB's `substr` count, so the
  * oracle can cut the identical chunks). Contract shared with the SQL
  * replay in `Dedup.cdcSql`:
  *
  *   gear(cp) = (cp · 2654435761) mod 2³²
  *   h ← (2h + gear(cp)) mod 2⁶¹            (positive in a long — no
  *                                            sign-semantics drift vs SQL)
  *   boundary when chunk length ≥ minLen and h mod avgMask == 0; h resets
  *   per chunk; the final partial chunk always closes at end-of-string.
  */
case class GearChunkEnds(child: Expression, minLen: Int, avgMask: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gear_chunk_ends"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var start = 0
    var cpIdx = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      cpIdx += 1
      h = ((h << 1) + (cp.toLong * 2654435761L) % 4294967296L) % 2305843009213693952L
      if (cpIdx - start >= minLen && h % avgMask == 0) {
        ends += cpIdx
        start = cpIdx
        h = 0L
      }
    }
    if (start < cpIdx) ends += cpIdx
    new org.apache.spark.sql.catalyst.util.GenericArrayData(ends.toArray)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val ends = ctx.freshName("ends")
      val h = ctx.freshName("h")
      val start = ctx.freshName("start")
      val cpIdx = ctx.freshName("cpIdx")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val arr = ctx.freshName("arr")
      val k = ctx.freshName("k")
      s"""
         |String $s = $c.toString();
         |java.util.ArrayList<Integer> $ends = new java.util.ArrayList<Integer>();
         |long $h = 0L;
         |int $start = 0;
         |int $cpIdx = 0;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += Character.charCount($cp);
         |  $cpIdx++;
         |  $h = (($h << 1) + ((long) $cp * 2654435761L) % 4294967296L) % 2305843009213693952L;
         |  if ($cpIdx - $start >= $minLen && $h % $avgMask == 0) {
         |    $ends.add($cpIdx);
         |    $start = $cpIdx;
         |    $h = 0L;
         |  }
         |}
         |if ($start < $cpIdx) $ends.add($cpIdx);
         |int[] $arr = new int[$ends.size()];
         |// explicit unbox: Janino compiles without generics, so get()
         |// is Object — the raw assignment fails to COMPILE in a stock
         |// session (and silently falls back to interpreted eval in tests)
         |for (int $k = 0; $k < $arr.length; $k++) $arr[$k] = ((Integer) $ends.get($k)).intValue();
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
