package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}

/** Build-side map contract shared by the exec's interpreted and
  * whole-stage-generated probe loops (the generated Java calls
  * `headFor`/`rowAt`/`next` directly, so this must stay a plain JVM
  * interface). Implementations are single-writer per partition task —
  * the reference's cross-thread sharing is replaced by Spark's shuffle
  * co-location (see `ParallelHashJoinExec` O2 notes). */
trait GraftBuildMap {
  /** `row` must already be owned by the caller (copied). */
  def append(row: InternalRow): Unit
  def size: Int
  def clear(): Unit
  def next(i: Int): Int
  def rowAt(i: Int): InternalRow
  def headFor(key: UnsafeRow): Int
}

/** Open-addressing build map — the reference's version10 design
  * (`/root/reference/src/operator/version10/build_implementation.rs:13-191`,
  * `new_map_3/fixed_table.rs`: open-addressed slot table, probe
  * sequences, generational growth) in its single-writer per-partition
  * form: a power-of-two slot array probed linearly, per-key entry
  * arrays (hash, chain head), and the same int-chain row links as
  * `GraftChainMap`. No per-key boxing on the probe path: a lookup is
  * hash → slot probes over an int array → chain head. The reference's
  * SIMD group scan and cooperative migration are dropped (one writer,
  * no contention); growth re-probes entries by their stored hash.
  * Selected via `spark.graft.parallelHashJoin.map=open`. */
final class GraftOpenMap(keyProj: UnsafeProjection) extends GraftBuildMap {
  private val rowsBuf = new mutable.ArrayBuffer[InternalRow]()
  private var nextIdx = new Array[Int](1024)

  // parallel per-entry arrays: one entry per distinct non-null key
  private val entryKeys = new mutable.ArrayBuffer[UnsafeRow]()
  private var entryHash = new Array[Int](256)
  private var entryHead = new Array[Int](256)
  private var nEntries = 0

  // slot table: -1 empty, else entry index; capacity is a power of two
  private var slots = Array.fill(512)(-1)
  private var mask = 511

  override def size: Int = rowsBuf.length

  override def clear(): Unit = {
    rowsBuf.clear()
    entryKeys.clear()
    nEntries = 0
    java.util.Arrays.fill(slots, -1)
  }

  /** Linear probe: the slot holding `key`'s entry, or the empty slot
    * where it would be inserted. Load factor is capped at 3/4 so an
    * empty slot always exists. */
  private def findSlot(h: Int, key: UnsafeRow): Int = {
    var s = h & mask
    while (true) {
      val e = slots(s)
      if (e == -1 || (entryHash(e) == h && entryKeys(e).equals(key))) return s
      s = (s + 1) & mask
    }
    -1 // unreachable
  }

  /** Generational growth: double the slot table and re-probe every
    * entry by its stored hash (rows and chains are untouched). */
  private def grow(): Unit = {
    slots = Array.fill(slots.length * 2)(-1)
    mask = slots.length - 1
    var e = 0
    while (e < nEntries) {
      var s = entryHash(e) & mask
      while (slots(s) != -1) s = (s + 1) & mask
      slots(s) = e
      e += 1
    }
  }

  override def append(row: InternalRow): Unit = {
    val idx = rowsBuf.length
    rowsBuf += row
    if (nextIdx.length <= idx) nextIdx = java.util.Arrays.copyOf(nextIdx, nextIdx.length * 2)
    val key = keyProj(row)
    if (!key.anyNull) {
      if ((nEntries + 1) * 4 > slots.length * 3) grow()
      val h = key.hashCode
      val s = findSlot(h, key)
      val e = slots(s)
      if (e == -1) {
        if (entryHash.length <= nEntries) {
          entryHash = java.util.Arrays.copyOf(entryHash, entryHash.length * 2)
          entryHead = java.util.Arrays.copyOf(entryHead, entryHead.length * 2)
        }
        entryKeys += key.copy()
        entryHash(nEntries) = h
        entryHead(nEntries) = idx
        slots(s) = nEntries
        nEntries += 1
        nextIdx(idx) = -1
      } else {
        // existing key: push this row onto the entry's chain
        nextIdx(idx) = entryHead(e)
        entryHead(e) = idx
      }
    }
  }

  override def next(i: Int): Int = nextIdx(i)

  override def rowAt(i: Int): InternalRow = rowsBuf(i)

  override def headFor(key: UnsafeRow): Int =
    if (key.anyNull) -1
    else {
      val e = slots(findSlot(key.hashCode, key))
      if (e == -1) -1 else entryHead(e)
    }
}
