package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Iceberg-spec-exact bucket transform.
  *
  * [[Transform.Bucket]] uses Spark's murmur3 (`hash()`) — fast and fine for
  * our own parquet layout, but not byte-compatible with Apache Iceberg's
  * bucket partitioning (SURVEY.md §4.3). This expression implements the
  * Iceberg spec's hashing exactly (public Iceberg table spec, Appendix B):
  * standard murmur3_x86_32 (seed 0) over the value's canonical bytes —
  * ints/longs/dates/timestamps as 8-byte little-endian longs, strings as
  * UTF-8 — then `(hash & Int.MaxValue) % N`. Matching bytes means a table
  * written here buckets rows into the same partitions a real Iceberg
  * writer would, so files interoperate.
  */
object IcebergBucketing {

  /** Standard murmur3_x86_32 (Austin Appleby's reference algorithm). */
  private[graft] def murmur3(bytes: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = bytes.length
    var h = seed
    var i = 0
    while (i + 4 <= len) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (len & 3) match {
      case 3 =>
        k ^= (bytes(i + 2) & 0xff) << 16
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 2 =>
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 1 =>
        k ^= bytes(i) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    h ^= len
    h ^= (h >>> 16)
    h *= 0x85ebca6b
    h ^= (h >>> 13)
    h *= 0xc2b2ae35
    h ^= (h >>> 16)
    h
  }

  private[graft] def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  private[graft] def bucketOf(hash: Int, n: Int): Int =
    (hash & Integer.MAX_VALUE) % n

  case class IcebergBucket(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0, s"bucket count must be positive, got $n")
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any = {
      val h = child.dataType match {
        case LongType => hashLong(v.asInstanceOf[Long])
        // ints promote to long so bucket(34:int) == bucket(34L) per spec
        case IntegerType | ShortType | ByteType =>
          hashLong(v.asInstanceOf[Number].longValue())
        case StringType =>
          val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          murmur3(s.getBytes)
        case TimestampType | TimestampNTZType => hashLong(v.asInstanceOf[Long])
        case DateType => hashLong(v.asInstanceOf[Int].toLong)
        case other => throw new IllegalArgumentException(
          s"iceberg bucket unsupported for type $other")
      }
      java.lang.Integer.valueOf(bucketOf(h, n))
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def icebergBucket(spark: SparkSession, c: Column, n: Int): Column = {
    val name = s"graft_iceberg_bucket_$n"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => IcebergBucket(es.head, n), "built-in")
    call_function(name, c)
  }
}
