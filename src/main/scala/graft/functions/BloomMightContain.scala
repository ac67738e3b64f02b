package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a long key against a
  * pre-built `org.apache.spark.util.sketch.BloomFilter` (the sketch Spark's
  * own runtime row-level filtering uses), serialized into the expression as
  * bytes.
  *
  * Why an Expression and not a UDF: the probe sits in the hottest possible
  * place — a scan-side filter over the FULL fact table — so it must stay
  * inside whole-stage codegen (a boxed Scala UDF there would also block
  * further predicate pushdown around it). The filter deserializes ONCE per
  * executor (transient lazy), never per row; generated code probes via a
  * constant object reference.
  *
  * Scale rationale (SURVEY §4.2 tier b): a semi-join against a dim too big
  * to broadcast as a hash relation shuffles the entire fact table. A bloom
  * filter of the dim keys is hundreds of times smaller than the hash
  * relation (~1.2 bytes/key at 1% fpp), ships to every task as plan
  * metadata, and drops (1 − selectivity − fpp) of fact rows BEFORE the
  * exchange — the classic bloom-join from the distributed-DB literature,
  * and what Spark's InjectRuntimeFilter does for eligible shuffle joins;
  * this expression makes the same plan available explicitly (pre-computed
  * dim side, index-style reuse across queries, contract-checkable fpp).
  *
  * Semantics: input must be LongType (callers hash arbitrary keys with
  * xxhash64 — the same canonicalization the near-dup operators use); NULL
  * in → NULL out; never a false negative (BloomFilter guarantee).
  */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got " +
        child.dataType.catalogString)

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  override def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // the deserialized filter rides the generated class's references
    // array — one constant-folded object per task, zero per-row cost
    // beyond the hash probes themselves
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)

  // Array[Byte] is reference-equal by default, which would make two
  // structurally identical probes compare unequal (harmless) but, worse,
  // makes THIS expression unstable under plan canonicalization — compare
  // the bytes by value.
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) =>
      c == child && java.util.Arrays.equals(b, bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bits)
}

object BloomMightContain {
  /** Registers `bloom_might_contain(key, bits)` (idempotent). The bits
    * argument must be a binary literal — it is unwrapped at plan time, so
    * the per-row expression carries no binary comparison. */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "bloom_might_contain",
        exprs => exprs(1) match {
          case Literal(v: Array[Byte], BinaryType) =>
            BloomMightContain(exprs(0), v)
          case other => throw new IllegalArgumentException(
            "bloom_might_contain expects a binary LITERAL bloom, got " +
              other.sql)
        },
        "built-in")

  /** Column-API entry point (session must have register()-ed). */
  def bloom_might_contain(key: Column, bf: BloomFilter): Column = {
    val os = new ByteArrayOutputStream()
    bf.writeTo(os)
    org.apache.spark.sql.functions.call_function("bloom_might_contain",
      key, org.apache.spark.sql.functions.lit(os.toByteArray))
  }
}
