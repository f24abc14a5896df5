package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}

/** Decoded Bloom filter: `k` probes over `words` (length a power of two,
  * so the bit index is a mask, not a modulo). Top-level class so the
  * generated Java can name it without `$`-nesting. */
final class GraftBloom(val k: Int, val words: Array[Long]) extends Serializable {
  val mask: Int = words.length * 64 - 1
}

/** Runtime Bloom-filter membership test over BIGINT keys — the probe half
  * of a distributed semi-join prune (the pattern Spark's own AQE runtime
  * filters implement for DPP-ineligible joins, and the analogue of the
  * reference's staged "fetch ids first, then hydrate" two-phase reads,
  * e.g. scanner/DGIS_SCAN_2_stable.py's per-layer id prefetch).
  *
  * The filter is carried as a base64 STRING literal ([[BloomCodec]]), so
  * the expression is buildable from pure SQL
  * (`graft_bloom_contains(l_partkey, '<b64>')`) and from the registry
  * path like every other graft function. The literal decodes ONCE per
  * expression instance into a `long[]` word array (lazy transient +
  * codegen reference object — the generated code never touches base64).
  *
  * Contract: false positives allowed, false negatives impossible — so it
  * may ONLY gate a subsequent exact join (which removes the false
  * positives). Null key → null (a null key can't equi-join anyway).
  * Hashing is Kirsch–Mitzenmacher double hashing over a splitmix64
  * finalizer. */
case class BloomContainsLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a BIGINT key, got ${left.dataType.simpleString}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects a foldable STRING bloom literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: GraftBloom =
    BloomCodec.decode(String.valueOf(right.eval()))

  override protected def nullSafeEval(key: Any, b64: Any): Any =
    BloomCodec.contains(bloom, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", bloom,
      classOf[GraftBloom].getName)
    // The decoded filter rides along as a reference object; the probe is
    // one static call on the key (the b64 string constant-folds away).
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = graft.functions.BloomCodec.contains($bloomRef, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Wire codec + hash kernel for [[BloomContainsLong]]. Layout:
  * base64(int32 k, int32 numWords, int64×numWords) big-endian. */
object BloomCodec {

  def encode(k: Int, words: Array[Long]): String = {
    require(Integer.bitCount(words.length) == 1,
      s"bloom word count must be a power of two, got ${words.length}")
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(k).putInt(words.length)
    words.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(b64: String): GraftBloom = {
    val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(b64))
    val k = bb.getInt()
    val n = bb.getInt()
    val words = Array.fill(n)(bb.getLong())
    new GraftBloom(k, words)
  }

  /** splitmix64 finalizer — full-avalanche, allocation-free. */
  @inline private def mix(x: Long): Long = {
    var h = x + 0x9E3779B97F4A7C15L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** Set the k probe bits for `key` in `words` (mask = bits-1). */
  def add(words: Array[Long], mask: Int, k: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2).toInt) & mask
      words(idx >>> 6) |= 1L << idx
      i += 1
    }
  }

  /** Membership probe — called from both interpreted eval and generated
    * Java (the object's static forwarder makes the Java call site clean). */
  def contains(bloom: GraftBloom, key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < bloom.k) {
      val idx = ((h1 + i * h2).toInt) & bloom.mask
      if ((bloom.words(idx >>> 6) & (1L << idx)) == 0L) return false
      i += 1
    }
    true
  }
}
