package graft.stream

import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path => HPath}
import org.apache.spark.sql.SparkSession

/** The shared skeleton of the four index-maintenance loops (IVF:
  * [[IndexLoop]], BM25: [[LexIndexLoop]], kNN graph: [[GraphIndexLoop]],
  * media signatures: [[MediaIndexLoop]]) — each runs the reference's
  * accumulate → threshold → rebuild lifecycle
  * (AwsTableManagementMetricsEvaluator.java:64-140) over a different
  * index family, and before r15 each re-implemented the same three
  * pieces of machinery with slightly different idempotency guarantees:
  *
  *  - the atomically-swapped SERVING HANDLE ([[ServingRef]]): one
  *    `AtomicReference` snapshot per loop, readers take one consistent
  *    state per operation;
  *  - the per-batch COMMIT MARKER ([[MetaStore]]): the post-batch
  *    driver state persisted as `_meta/state-<prefix><ordinal>.json`,
  *    written LAST so a marker either exists complete or not at all —
  *    a replayed batch at or below the recorded last id no-ops; one
  *    whose marker is missing re-applies over its own overwritten
  *    partial outputs;
  *  - VERSION-LAYOUT RETENTION ([[gcVersions]]): published layout dirs
  *    are immutable and epoch-named; the newest [[RetainLayouts]] stay
  *    (an in-flight reader holds a snapshot for at most one
  *    micro-batch), older generations are swept — expire_snapshots'
  *    retain-last-N semantics applied to the loops' own layout chains,
  *    so superseded `v<k>`/`e<k>` dirs no longer accumulate forever in
  *    a long-running deployment.
  *
  * '''All IO is Hadoop-`FileSystem`-resolved (r16).''' Every path here
  * is a String URI resolved through `Path.getFileSystem` against the
  * active session's Hadoop configuration — the loops run unchanged
  * against any registered scheme (local `file:`, HDFS, an object-store
  * connector), the seam the reference reaches through Iceberg's FileIO
  * (BaseEmrOptimizeDataExecutor.java:82-89). The commit discipline is
  * chosen to survive object stores, where rename is not a directory
  * move and readers must never depend on one:
  *
  *  - '''Payload first, one small marker LAST''' (the manifest-commit
  *    pattern [[graft.exts.ArtifactStore]] proved): all data files of a
  *    batch land under batch-deterministic paths with overwrite
  *    semantics, then the single `_meta/state-*.json` marker commits
  *    the batch. Readers resolve state via markers only — a torn batch
  *    (payload landed, marker missing) is invisible and gets
  *    overwritten identically on replay, so payload renames never need
  *    atomicity.
  *  - '''Marker writes''' go through tmp + rename on the SAME
  *    filesystem: atomic on POSIX/HDFS; on S3-class stores the rename
  *    materializes the destination via a server-side copy whose
  *    visibility is all-or-nothing per object, so a reader still never
  *    observes a partial marker. Marker content is idempotent per
  *    ordinal, so a concurrent re-commit of the same ordinal is
  *    last-writer-wins over identical bytes.
  *  - '''Markers are garbage-collected''' ([[MetaStore.write]] keeps
  *    the newest [[RetainMarkers]]): a long-running deployment no
  *    longer accumulates one `state-*.json` per batch forever, and
  *    [[MetaStore.newest]] (the reattach cold path) lists a bounded
  *    directory. Replay guards key on the in-memory/reattached
  *    `lastBatchId` — never on the presence of an OLD marker — so
  *    sweeping history is safe.
  */
private[stream] object LoopCore {

  /** Layout generations kept besides the current one: a reader that
    * snapshotted just before a swap still reads a complete previous
    * generation; anything older has no live readers. */
  val RetainLayouts = 2

  /** Commit markers kept per store (≥ [[RetainLayouts]]): enough for
    * reattach plus post-mortem context, bounded for long deployments. */
  val RetainMarkers = 8

  /** Atomically-swapped serving-state cell — every loop handle wraps
    * one. */
  class ServingRef[S](initial: S) {
    private val ref = new AtomicReference[S](initial)
    /** One consistent read — serving paths snapshot ONCE per batch so a
      * concurrent maintenance bump cannot mix two generations. */
    def snapshot: S = ref.get()
    private[stream] def state: S = ref.get()
    private[stream] def update(s: S): Unit = ref.set(s)
    /** Serializes COMMITTING operations on this handle — each loop's
      * applyBatch and its fleet-dispatched rebuild
      * ([[FleetHealth.maintenanceTick]]) both read the state at entry
      * and commit at exit, so interleaving them would lose one side's
      * update (and collide its marker ordinal). READ paths stay
      * lock-free on the atomic snapshot; only writers queue. One lock
      * per handle, never held across handles, so the tick (one family
      * per call) cannot deadlock with any stream. */
    private[stream] def withCommitLock[A](body: => A): A =
      commitLock.synchronized(body)
    private val commitLock = new Object
  }

  /** The session Hadoop conf. `getActiveSession` is a THREAD-LOCAL, and
    * Hadoop's FileSystem cache keys on (scheme, authority, UGI) — not on
    * the conf — so a filesystem first resolved from a non-session thread
    * with a bare `new Configuration()` would be cached WITHOUT the
    * session's `spark.hadoop.*` settings (object-store credentials,
    * `fs.<scheme>.impl` registrations) and then reused by session
    * threads. Fall back to the JVM-global default session first; the
    * bare conf remains only for sessionless unit contexts. */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Resolve a string path to its (FileSystem, Path) pair — the single
    * seam every IO call below goes through. */
  def resolve(path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(hadoopConf), p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p)
  }

  def isDirectory(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  /** Child entries of a directory as (name, full path string); empty
    * for a missing/non-directory path. */
  def listDir(path: String): Seq[(String, String)] = {
    val (fs, p) = resolve(path)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) Seq.empty
    else fs.listStatus(p).toSeq
      .map(st => (st.getPath.getName, st.getPath.toString))
  }

  def deleteRecursively(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Write `content` so the target is never observed partial: tmp file
    * + same-FS rename (atomic on POSIX/HDFS; object-store renames
    * materialize whole objects). Used for commit markers ONLY — data
    * payloads rely on the marker-written-last protocol instead.
    *
    * A pre-existing target is NEVER deleted first (a delete+rename pair
    * would open a window with no marker at all — a crash inside it
    * erases a previously committed marker): the rename goes straight at
    * the target, and on filesystems whose rename refuses an existing
    * destination (HDFS) the existing marker is ACCEPTED as the winner —
    * but only after a CONTENT COMPARE (r18). Marker content is
    * deterministic per ordinal only under the loops' single-writer-
    * per-root protocol (in process, the per-handle commit lock
    * enforces it; two live handles on one root in different JVMs are
    * OUTSIDE the protocol). A matching winner means an identical prior
    * commit of this ordinal already holds the target and either copy
    * commits the batch; a DIVERGENT winner means two writers committed
    * different states at one ordinal — that protocol violation fails
    * loudly here instead of silently discarding the loser's state. */
  def atomicWrite(path: String, content: String): Unit = {
    val (fs, p) = resolve(path)
    fs.mkdirs(p.getParent)
    val tmp = new HPath(p.getParent,
      s"${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      if (!fs.exists(p)) throw new IllegalStateException(
        s"loopCore: marker rename failed and no winner exists at $p")
      val winner = readString(path)
      if (winner != content) throw new IllegalStateException(
        s"loopCore: marker collision with DIVERGENT content at $p — " +
          "two writers committed different states at one ordinal " +
          "(single-writer-per-root violated); refusing to silently " +
          "discard either state")
      // else: an identical prior commit of this ordinal already holds
      // the target (idempotent markers) — nothing to do
    }
  }

  def readString(path: String): String = {
    val (fs, p) = resolve(path)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Copy one data file `src` → `dst`, sharing bytes via a hard link
    * when both live on a local filesystem (the epoch-publish fast
    * path), streaming a copy otherwise — the only primitive whose
    * behavior is FS-dependent, and only as an optimization. */
  def copyOrLink(src: String, dst: String): Unit = {
    val (sfs, sp) = resolve(src)
    val (dfs, dp) = resolve(dst)
    val local = sfs.getScheme == "file" && dfs.getScheme == "file"
    dfs.mkdirs(dp.getParent)
    if (local) {
      val from = java.nio.file.Paths.get(sp.toUri.getPath)
      val to = java.nio.file.Paths.get(dp.toUri.getPath)
      try {
        java.nio.file.Files.deleteIfExists(to)
        java.nio.file.Files.createLink(to, from)
        return
      } catch {
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException => // fall through
      }
    }
    FileUtil.copy(sfs, sp, dfs, dp, false, true, hadoopConf)
  }

  /** Escape a string for embedding in a flat JSON marker. */
  def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  }

  private def jsonUnescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case n => b.append(n); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Render a JSON string field (escaped) — loops' encoders use this
    * for every string-valued state field. */
  def jsonStr(v: String): String = "\"" + jsonEscape(v) + "\""

  /** Extract `"key":<long>` from a flat JSON marker payload. */
  def jsonLong(j: String, k: String): Long =
    s""""$k":(-?\\d+)""".r.findFirstMatchIn(j).getOrElse(
      throw new IllegalStateException(s"marker missing \"$k\": $j")
    ).group(1).toLong

  /** Like [[jsonLong]] but `None` when the key is absent — the decode
    * back-compat seam for fields ADDED after roots already carried
    * markers (e.g. `commitSeq`, r17): a pre-upgrade marker decodes
    * with a caller-chosen default instead of failing reattach. */
  def jsonLongOpt(j: String, k: String): Option[Long] =
    s""""$k":(-?\\d+)""".r.findFirstMatchIn(j).map(_.group(1).toLong)

  /** Like [[jsonString]] but `None` when the key is absent (same
    * back-compat seam for string-valued fields, e.g. `kind`). */
  def jsonStringOpt(j: String, k: String): Option[String] =
    s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(j)
      .map(m => jsonUnescape(m.group(1)))

  /** Extract `"key":"<string>"` from a flat JSON marker payload —
    * escape-aware, the inverse of [[jsonStr]] (a state field carrying
    * quotes or backslashes round-trips). */
  def jsonString(j: String, k: String): String =
    jsonUnescape(s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r
      .findFirstMatchIn(j).getOrElse(
        throw new IllegalStateException(s"marker missing \"$k\": $j")
      ).group(1))

  /** Per-batch commit-marker store under `<root>/_meta`: one
    * `state-<prefix><ordinal>.json` per applied batch, the newest
    * [[RetainMarkers]] retained. `encode` renders the loop's full
    * post-batch state; `decode` restores it. */
  final class MetaStore[S](root: String, prefix: String,
      encode: S => String, decode: String => S) {
    def dir: String = s"$root/_meta"
    def file(ord: Long): String = s"$dir/state-$prefix$ord.json"
    private def ordOf(name: String): Option[Long] =
      if (name.matches(s"state-$prefix-?\\d+\\.json"))
        Some(name.stripPrefix(s"state-$prefix")
          .stripSuffix(".json").toLong)
      else None
    /** Commit the post-batch state — called LAST in every apply; then
      * sweep markers older than the newest [[RetainMarkers]] (replay
      * guards key on lastBatchId, never on old-marker presence, so
      * history is safe to bound). */
    def write(ord: Long, s: S): Unit = {
      atomicWrite(file(ord), encode(s))
      val ords = listDir(dir).flatMap { case (n, p) =>
        ordOf(n).map(_ -> p)
      }.sortBy(_._1)
      ords.dropRight(RetainMarkers).foreach { case (_, p) =>
        deleteRecursively(p)
      }
    }
    /** The marker for one ordinal, if committed (and retained). */
    def read(ord: Long): Option[S] =
      if (!exists(file(ord))) None
      else Some(decode(readString(file(ord))))
    /** The newest committed state (the reattach cold path). */
    def newest: Option[S] = listDir(dir)
      .flatMap { case (n, p) => ordOf(n).map(_ -> p) }
      .maxByOption(_._1)
      .map { case (_, p) => decode(readString(p)) }
  }

  /** Guard every loop's `start` runs when handed a root with committed
    * batches: streaming batch ids are monotone only WITHIN one
    * checkpoint lineage, so a NEW query (fresh or absent checkpoint)
    * restarts at 0 and every id up to the recorded last would hit the
    * replay guard and silently no-op — its documents dropped with no
    * error. Resuming such a root therefore REQUIRES the original
    * checkpoint; a fresh root (or an explicit rebuild) is the other
    * legitimate path. A checkpoint that is itself fresh remains the
    * caller's contract — the ambiguity a path string cannot reveal —
    * but the unambiguous no-checkpoint footgun fails loudly here. */
  def requireCheckpointIfResuming(loop: String, lastBatchId: Long,
      checkpoint: Option[String]): Unit =
    if (checkpoint.isEmpty && lastBatchId >= 0L)
      throw new IllegalStateException(
        s"$loop: root already has committed batches (lastBatchId=" +
          s"$lastBatchId); a new query without the original checkpoint " +
          "restarts batch ids at 0, which the replay guard would " +
          "silently no-op — pass the original checkpoint (durable " +
          "restart) or use a fresh root")

  /** Retention sweep over a loop's versioned layout dirs: keep the
    * `retain` highest-ordinal dirs whose name matches `pattern` (whose
    * single capture group is the ordinal), delete the rest. Published
    * layouts are immutable, so deleting a generation ≥ `retain` swaps
    * behind never races a reader. */
  def gcVersions(root: String, pattern: scala.util.matching.Regex,
      retain: Int = RetainLayouts): Unit = {
    val versioned = listDir(root).flatMap { case (name, p) =>
      name match {
        case pattern(ord) => Some((ord.toLong, p))
        case _ => None
      }
    }.sortBy(_._1)
    versioned.dropRight(retain).foreach { case (_, p) =>
      deleteRecursively(p)
    }
  }
}
