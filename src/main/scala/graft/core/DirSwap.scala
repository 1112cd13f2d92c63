package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement for the persisted-index
  * compactors (postings, dedup signatures, ANN buckets, sketches).
  *
  * The naive `delete(live); rename(tmp, live)` has a window where a
  * crash leaves NO live directory at all — only the `_compacting`
  * copy, requiring manual recovery (round-11 ADVICE). [[swap]]
  * narrows that to two metadata-only renames and keeps the old data
  * recoverable at every step:
  *
  *  1. delete any `<live>_old` leftover from a previously crashed
  *     swap (its live dir was already healthy, or step 3 below never
  *     ran — either way the leftover is dead);
  *  2. rename live → `<live>_old`, rename tmp → live;
  *  3. delete `<live>_old` LAST.
  *
  * A crash before step 2's second rename leaves the full index at
  * `<live>_old` (recovery = one rename back); a crash after it
  * leaves a healthy live dir plus a stale `_old` that the next swap
  * (or a manual delete) clears. A concurrent reader can still
  * observe the missing-path instant between the two renames — that
  * is the documented limit of swap-by-rename on a filesystem without
  * atomic directory exchange; serve loops that cannot tolerate it
  * should pause ingest/probes around compaction (the streaming specs
  * run compaction between batches for exactly this reason).
  */
object DirSwap {

  def swap(fs: FileSystem, live: Path, tmp: Path): Unit = {
    val old = new Path(live.toString + "_old")
    fs.delete(old, true) // leftover from a previously crashed swap
    require(fs.rename(live, old), s"swap: could not move $live aside")
    require(fs.rename(tmp, live), s"swap: could not move $tmp into $live " +
      s"— the index is intact at $old (rename it back to recover)")
    fs.delete(old, true) // delete LAST: every earlier crash point keeps a full copy
    ()
  }

  /** Carry the stream-ingest `_batches/<id>` idempotence markers into
    * a freshly written compacted directory BEFORE it is swapped in —
    * without this, a stream that crashed mid-batch and restarts after
    * compaction finds no marker for its re-delivered batch and
    * appends it a second time, breaking the append == from-scratch
    * serve-equivalence contract (round-11 ADVICE). Markers are empty
    * files, so "copy" is creation by name; a live dir without markers
    * is a no-op. Copying (not renaming) means the live directory is
    * never mutated before the swap. */
  def preserveBatchMarkers(fs: FileSystem, live: Path, tmp: Path): Unit = {
    val src = new Path(live, "_batches")
    if (!fs.exists(src)) return
    val dst = new Path(tmp, "_batches")
    fs.mkdirs(dst)
    fs.listStatus(src).foreach { st =>
      if (st.isFile) fs.create(new Path(dst, st.getPath.getName), true).close()
    }
  }
}
