package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Thin public wrapper over Spark's package-private
  * [[ExternalAppendOnlyUnsafeRowArray]] (the buffer SortMergeJoin and
  * Window use for their spillable row groups): rows accumulate in memory
  * up to the given thresholds, then move to an UnsafeExternalSorter-backed
  * store that spills to disk under task-memory pressure. `iterator` may be
  * called repeatedly (each call invalidates the previous iterator), which
  * is what the graft join's chunked fallback needs to re-scan the probe
  * side once per build chunk. */
class GraftSpillableRowBuffer(
    numRowsInMemoryThreshold: Int = 4096,
    maxBytesInMemory: Long = 64L * 1024 * 1024) {

  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    numRowsInMemoryThreshold, maxBytesInMemory, Int.MaxValue, Long.MaxValue)

  /** Copies the row's bytes into the buffer — caller may reuse `row`. */
  def add(row: UnsafeRow): Unit = arr.add(row)
  def length: Int = arr.length
  def spillSizeBytes: Long = arr.spillSize
  /** Fresh scan; invalidates previously generated iterators. */
  def iterator: Iterator[UnsafeRow] = arr.generateIterator()
  def clear(): Unit = arr.clear()
}
