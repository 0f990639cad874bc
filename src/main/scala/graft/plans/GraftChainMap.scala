package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}

/** Build-side chain-layout hash map: key → head row index, int next[]
  * chain — no per-row boxing, no per-key buffers; the reference's
  * index-chain map shape (`concurrent_self_hash_join_map.rs`
  * append_block) in its single-writer per-partition form. Public (not
  * nested) because whole-stage-generated Java calls `headFor`/`rowAt`/
  * `next` directly in the probe loop. */
final class GraftChainMap(keyProj: UnsafeProjection) extends GraftBuildMap {
  private val rowsBuf = new mutable.ArrayBuffer[InternalRow]()
  private val keyHead = new java.util.HashMap[UnsafeRow, Integer]()
  private var nextIdx = new Array[Int](1024)

  def size: Int = rowsBuf.length

  def clear(): Unit = {
    rowsBuf.clear()
    keyHead.clear()
  }

  /** `row` must already be owned by the caller (copied). */
  def append(row: InternalRow): Unit = {
    val idx = rowsBuf.length
    rowsBuf += row
    if (nextIdx.length <= idx) nextIdx = java.util.Arrays.copyOf(nextIdx, nextIdx.length * 2)
    val key = keyProj(row)
    if (!key.anyNull) {
      val prevHead = keyHead.get(key)
      if (prevHead == null) {
        keyHead.put(key.copy(), idx)
        nextIdx(idx) = -1
      } else {
        // entry exists: HashMap keeps the stored key object, so the
        // reused projection row is safe to pass here
        keyHead.put(key, idx)
        nextIdx(idx) = prevHead.intValue()
      }
    }
  }

  def next(i: Int): Int = nextIdx(i)

  def rowAt(i: Int): InternalRow = rowsBuf(i)

  def headFor(key: UnsafeRow): Int =
    if (key.anyNull) -1
    else {
      val h = keyHead.get(key)
      if (h == null) -1 else h.intValue()
    }
}
