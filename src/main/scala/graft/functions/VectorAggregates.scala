package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Mutable aggregation state: running element-wise sums + row count. */
final class VecAvgBuffer(var sums: Array[Double], var n: Long)

/** Element-wise mean over an `array<float>` or `array<double>` column as
  * a custom `TypedImperativeAggregate` — the centroid step of IVF/k-means
  * over embeddings (double arrays arise from residual relations, where
  * the subtraction is performed in widened precision).
  *
  * Why a custom aggregate: the expressible alternative explodes every
  * vector into `dim` (index, value) rows and hash-aggregates them —
  * a dim-fold row blowup THROUGH THE SHUFFLE. This aggregate accumulates
  * into one primitive `double[dim]` buffer per group per partition
  * map-side, so the shuffle carries a single serialized vector per
  * (partition, group) — at 100 TB the difference between shuffling
  * 64 x corpus rows and |groups| x partitions buffers.
  *
  * Accumulation is in double precision; results match the exploded-SQL
  * oracle to well under the 1e-6 rounding applied by callers.
  *
  * Null arrays are ignored; null ELEMENTS count as 0 toward that
  * position's sum (embeddings are dense — same contract as
  * [[FloatDotProduct]]). Ragged inputs are rejected at runtime.
  */
case class VectorAvgAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecAvgBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_vec_avg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_avg expects array<float> or array<double>, got ${t.simpleString}")
  }

  private val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VecAvgBuffer = new VecAvgBuffer(null, 0L)

  override def update(b: VecAvgBuffer, input: InternalRow): VecAvgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](d)
      require(b.sums.length == d,
        s"graft_vec_avg: ragged input (${b.sums.length} vs $d elements)")
      var i = 0
      while (i < d) {
        if (!arr.isNullAt(i))
          b.sums(i) += (if (elemIsDouble) arr.getDouble(i)
                        else arr.getFloat(i).toDouble)
        i += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(b: VecAvgBuffer, o: VecAvgBuffer): VecAvgBuffer = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums; b.n = o.n }
      else {
        require(b.sums.length == o.sums.length, "graft_vec_avg: ragged merge")
        var i = 0
        while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
        b.n += o.n
      }
    }
    b
  }

  override def eval(b: VecAvgBuffer): Any =
    if (b.sums == null || b.n == 0) null
    else new GenericArrayData(b.sums.map(_ / b.n))

  override def serialize(b: VecAvgBuffer): Array[Byte] = {
    val d = if (b.sums == null) 0 else b.sums.length
    val buf = java.nio.ByteBuffer.allocate(12 + 8 * d)
    buf.putLong(b.n).putInt(d)
    var i = 0
    while (i < d) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAvgBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getLong()
    val d = buf.getInt()
    if (d == 0) new VecAvgBuffer(null, n)
    else {
      val sums = new Array[Double](d)
      var i = 0
      while (i < d) { sums(i) = buf.getDouble(); i += 1 }
      new VecAvgBuffer(sums, n)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvgAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvgAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorAvgAggregate =
    copy(child = c)
}
