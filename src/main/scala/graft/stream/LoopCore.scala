package graft.stream

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicReference

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
  *    driver state persisted as `_meta/state-<prefix><ordinal>.json`
  *    via tmp + ATOMIC_MOVE, written LAST so a marker either exists
  *    complete or not at all — a replayed batch whose marker exists
  *    restores the recorded state and no-ops; one whose marker is
  *    missing re-applies over its own overwritten partial outputs;
  *  - VERSION-LAYOUT RETENTION ([[gcVersions]]): published layout dirs
  *    are immutable and epoch-named; the newest [[RetainLayouts]] stay
  *    (an in-flight reader holds a snapshot for at most one
  *    micro-batch), older generations are swept — expire_snapshots'
  *    retain-last-N semantics applied to the loops' own layout chains,
  *    so superseded `v<k>`/`e<k>` dirs no longer accumulate forever in
  *    a long-running deployment.
  */
private[stream] object LoopCore {

  /** Layout generations kept besides the current one: a reader that
    * snapshotted just before a swap still reads a complete previous
    * generation; anything older has no live readers. */
  val RetainLayouts = 2

  /** Atomically-swapped serving-state cell — every loop handle wraps
    * one. */
  class ServingRef[S](initial: S) {
    private val ref = new AtomicReference[S](initial)
    /** One consistent read — serving paths snapshot ONCE per batch so a
      * concurrent maintenance bump cannot mix two generations. */
    def snapshot: S = ref.get()
    private[stream] def state: S = ref.get()
    private[stream] def update(s: S): Unit = ref.set(s)
  }

  /** List a directory's entries with the stream closed (`Files.list`
    * leaks an fd per call otherwise — loops run this per batch). */
  def listDir(p: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
  }

  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** Write `content` via tmp + ATOMIC_MOVE — the target either exists
    * complete or not at all (the commit-marker discipline). */
  def atomicWrite(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.getParent.resolve(
      s"${path.getFileName}.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, content.getBytes("UTF-8"))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Extract `"key":<long>` from a flat JSON marker payload. */
  def jsonLong(j: String, k: String): Long =
    s""""$k":(-?\\d+)""".r.findFirstMatchIn(j).getOrElse(
      throw new IllegalStateException(s"marker missing \"$k\": $j")
    ).group(1).toLong

  /** Extract `"key":"<string>"` from a flat JSON marker payload. */
  def jsonString(j: String, k: String): String =
    s""""$k":"([^"]*)"""".r.findFirstMatchIn(j).getOrElse(
      throw new IllegalStateException(s"marker missing \"$k\": $j")
    ).group(1)

  /** Per-batch commit-marker store under `<root>/_meta`: one
    * `state-<prefix><ordinal>.json` per applied batch. `encode` renders
    * the loop's full post-batch state; `decode` restores it. */
  final class MetaStore[S](root: String, prefix: String,
      encode: S => String, decode: String => S) {
    def dir: Path = Paths.get(root, "_meta")
    def file(ord: Long): Path = dir.resolve(s"state-$prefix$ord.json")
    /** Commit the post-batch state — called LAST in every apply. */
    def write(ord: Long, s: S): Unit = atomicWrite(file(ord), encode(s))
    /** The marker for one ordinal, if committed. */
    def read(ord: Long): Option[S] =
      if (!Files.exists(file(ord))) None
      else Some(decode(new String(Files.readAllBytes(file(ord)), "UTF-8")))
    /** The newest committed state (the reattach cold path). */
    def newest: Option[S] = listDir(dir)
      .filter(_.getFileName.toString
        .matches(s"state-$prefix-?\\d+\\.json"))
      .maxByOption(p => p.getFileName.toString
        .stripPrefix(s"state-$prefix").stripSuffix(".json").toLong)
      .map(p => decode(new String(Files.readAllBytes(p), "UTF-8")))
  }

  /** Retention sweep over a loop's versioned layout dirs: keep the
    * `retain` highest-ordinal dirs whose name matches `pattern` (whose
    * single capture group is the ordinal), delete the rest. Published
    * layouts are immutable, so deleting a generation ≥ `retain` swaps
    * behind never races a reader. */
  def gcVersions(root: String, pattern: scala.util.matching.Regex,
      retain: Int = RetainLayouts): Unit = {
    val versioned = listDir(Paths.get(root)).flatMap { p =>
      p.getFileName.toString match {
        case pattern(ord) => Some((ord.toLong, p))
        case _ => None
      }
    }.sortBy(_._1)
    versioned.dropRight(retain).foreach { case (_, p) =>
      deleteRecursively(p)
    }
  }
}
