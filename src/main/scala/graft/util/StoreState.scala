package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe state management for graft's persisted stores (the
  * vector indexes, the BM25 text index, and the NetCDF-side stores):
  * generation directories with commit markers, per-batch commit
  * markers inside a generation, and a single-writer lock file.
  *
  * The design is marker-file commit, not rename-swap: a maintenance
  * op stages a COMPLETE new generation directory (`gen-00000002/...`),
  * then creates one `_COMMITTED` marker inside it — the atomic create
  * of that empty file is the commit point — and only then
  * garbage-collects older generations. Readers resolve the HIGHEST
  * committed generation, so at every instant the store resolves to a
  * complete file set:
  *   - crash before the marker: the staged dir is invisible garbage,
  *     readers keep using the previous generation, the next
  *     maintenance op reclaims it;
  *   - crash after the marker, before GC: two committed generations
  *     exist, readers use the newer, the next op reclaims the older.
  * There is no delete-then-rename window in which the store has no
  * data files (the failure mode of a flat-layout staged swap).
  *
  * Batch markers give appends the same contract at finer grain: an
  * append stages its files under `batch-<n>/` inside the current
  * generation and commits them with one `_BATCH_COMMITTED` create, so
  * a multi-file append (e.g. the text index's postings + df + stats +
  * docstats quadruple) becomes visible all-or-nothing.
  *
  * The lock is advisory single-writer enforcement: mutating store ops
  * run under [[withLock]], which atomically creates `_LOCK` (create
  * with overwrite=false) carrying the holder's host/pid/op and fails
  * LOUDLY if a second writer is already in. A crashed writer leaves
  * the lock behind by design — the error message tells the operator
  * what held it and how to clear it after confirming that writer is
  * dead (auto-expiry would re-introduce the double-writer hazard the
  * lock exists to prevent). Readers never take the lock.
  */
object StoreState {
  val LockName = "_LOCK"
  val GenMarker = "_COMMITTED"
  val BatchMarker = "_BATCH_COMMITTED"

  private val GenName = "^gen-(\\d{8})$".r
  // numeric batches come from batch appends; `batch-s<tag>` names come
  // from idempotent streaming appends (the tag is the streaming batch
  // id, so a replayed micro-batch overwrites its own directory)
  private val BatchName = "^batch-(\\d{8}|s[0-9]+)$".r

  def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def genName(n: Long): String = f"gen-$n%08d"
  def batchName(n: Long): String = f"batch-$n%08d"
  def streamBatchName(batchId: Long): String = s"batch-s$batchId"

  private def marked(f: FileSystem, dir: Path, marker: String): Boolean =
    f.exists(new Path(dir, marker))

  /** All generation dirs under `dir` as (number, path, committed). */
  private def genDirs(spark: SparkSession,
      dir: String): Seq[(Long, Path, Boolean)] = {
    val root = new Path(dir)
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case GenName(n) =>
            Some((n.toLong, st.getPath, marked(f, st.getPath, GenMarker)))
          case _ => None
        }
    }.flatten.sortBy(_._1)
  }

  /** The highest COMMITTED generation under `dir`, if any. */
  def committedGen(spark: SparkSession, dir: String): Option[Path] =
    genDirs(spark, dir).filter(_._3).lastOption.map(_._2)

  /** Where a reader finds the store's data: the highest committed
    * generation, or the store root itself for a legacy flat-layout
    * store (or a store about to be built). */
  def dataDir(spark: SparkSession, dir: String): String =
    committedGen(spark, dir).map(_.toString).getOrElse(dir)

  /** Path to stage the NEXT generation at: one past the highest
    * generation number present in ANY commit state (a crashed stage
    * must not be re-entered — it may hold partial files). */
  def nextGenPath(spark: SparkSession, dir: String): Path = {
    val next = genDirs(spark, dir).lastOption.map(_._1 + 1L).getOrElse(1L)
    new Path(dir, genName(next))
  }

  /** Commit a fully-staged generation: create its marker (the atomic
    * commit point), then garbage-collect every OTHER generation dir
    * and the listed legacy flat-layout names under the store root.
    * GC failures are non-fatal — leftovers are reclaimed by the next
    * maintenance op. */
  def commitGen(spark: SparkSession, dir: String, gen: Path,
      legacyNames: Seq[String] = Seq.empty): Unit = {
    val f = fs(spark, gen)
    f.create(new Path(gen, GenMarker), true).close()
    val cur = gen.getName
    try {
      genDirs(spark, dir).foreach { case (_, p, _) =>
        if (p.getName != cur) f.delete(p, true)
      }
      legacyNames.foreach { n =>
        val p = new Path(dir, n)
        if (f.exists(p)) f.delete(p, true)
      }
    } catch { case _: java.io.IOException => () }
  }

  /** All COMMITTED batch dirs under a generation (or flat) data dir,
    * in name order. */
  def committedBatches(spark: SparkSession, dataDir: String): Seq[Path] = {
    val root = new Path(dataDir)
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.collect {
      case st if st.isDirectory && BatchName.findFirstIn(
          st.getPath.getName).isDefined &&
          marked(f, st.getPath, BatchMarker) => st.getPath
    }.sortBy(_.getName)
  }

  /** Path to stage the next NUMERIC batch at (one past the highest
    * numeric batch present in any commit state). */
  def nextBatchPath(spark: SparkSession, dataDir: String): Path = {
    val root = new Path(dataDir)
    val f = fs(spark, root)
    val nums =
      if (!f.exists(root)) Seq.empty[Long]
      else f.listStatus(root).toSeq.flatMap(st =>
        st.getPath.getName match {
          case BatchName(n) if !n.startsWith("s") => Some(n.toLong)
          case _ => None
        })
    new Path(root, batchName(nums.sorted.lastOption.getOrElse(0L) + 1L))
  }

  /** Commit a fully-staged batch dir (atomic marker create). */
  def commitBatch(spark: SparkSession, batch: Path): Unit =
    fs(spark, batch).create(new Path(batch, BatchMarker), true).close()

  /** Uncommitted batch/generation cruft under `dataDir` — what a
    * compaction should fold away besides tombstones. */
  def uncommittedCruft(spark: SparkSession, dataDir: String): Seq[Path] = {
    val root = new Path(dataDir)
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.collect {
      case st if st.isDirectory && BatchName.findFirstIn(
          st.getPath.getName).isDefined &&
          !marked(f, st.getPath, BatchMarker) => st.getPath
    }
  }

  /** Run `body` holding the store's single-writer lock. The lock file
    * is created atomically (create with overwrite=false); if it
    * already exists the call fails with an error naming the current
    * holder and the remedy, WITHOUT touching the store. */
  def withLock[T](spark: SparkSession, dir: String, op: String)(
      body: => T): T = {
    val root = new Path(dir)
    val lock = new Path(dir, LockName)
    val f = fs(spark, root)
    if (!f.exists(root)) f.mkdirs(root)
    val holder =
      s"""{"op": "$op", "host": "${java.net.InetAddress.getLocalHost
        .getHostName}", "pid": ${ProcessHandle.current.pid}}"""
    val out =
      try f.create(lock, false)
      catch {
        case _: java.io.IOException =>
          val existing =
            try {
              val in = f.open(lock)
              try new String(
                org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
              finally in.close()
            } catch { case _: java.io.IOException => "<unreadable>" }
          sys.error(s"store $dir is locked by another writer: $existing — " +
            s"refusing to run '$op' concurrently (single-writer " +
            "contract). If that writer crashed, verify it is dead and " +
            s"delete $lock to recover.")
      }
    try out.write(holder.getBytes("UTF-8")) finally out.close()
    try body finally f.delete(lock, false)
  }
}
