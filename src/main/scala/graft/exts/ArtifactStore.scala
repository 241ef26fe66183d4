package graft.exts

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Shared on-disk store for persisted index artifacts (BM25 postings,
  * DSIR score table, kNN edge list, ...) — the build-once / serve-many
  * lifecycle the reference applies to its table-maintenance outputs
  * (AwsTableManagementMetricsEvaluator.java:108-140 accumulates events,
  * crosses a threshold, rebuilds, and every later reader picks up the
  * committed result), lifted to the engine's own derived structures.
  *
  * Design constraints this object owns (previously scattered per-index):
  *
  *  - '''Configurable, permission-restricted root.''' Artifacts live
  *    under `spark.graft.artifactRoot` when set (a lake deployment points
  *    this at a shared mount, e.g. `/mnt/lake/graft_indexes`, so the
  *    nightly indexer and every query job resolve the same store — URI
  *    roots are rejected, see [[root]]); the
  *    default is a per-user directory created `rwx------` under the
  *    JVM tmpdir — never a world-writable shared path another local user
  *    could pre-plant artifacts in. (The corpus dir itself is typically a
  *    read-only mount for query jobs — as it is in this harness — which
  *    is why the root is a separate, configurable location rather than
  *    `$dir` itself.)
  *  - '''Identity is verified, not assumed.''' The artifact directory
  *    name embeds the sanitized corpus dir plus a 128-bit MD5 of the
  *    exact dir string and the [[graft.Tables.version]] snapshot token,
  *    and a `_MANIFEST.json` written inside the artifact records the
  *    full (kind, dir, variant, version) tuple. [[resolve]] trusts an
  *    existing directory only after the manifest round-trips — a path
  *    collision or a planted directory without a matching manifest is
  *    rebuilt, never served.
  *  - '''Publication is atomic.''' A build writes into a fresh staging
  *    directory (unique per attempt), the manifest is written LAST, and
  *    the staging dir is renamed into place with ATOMIC_MOVE — so a
  *    completion marker can never coexist with a half-written artifact,
  *    and two JVMs racing the same build can both run to completion: the
  *    loser's rename fails on the existing target, it discards its
  *    staging copy, and serves the winner's (bit-identical — builds are
  *    deterministic functions of the snapshot). On an object store
  *    without atomic rename the same protocol degrades gracefully: the
  *    manifest-written-last IS the commit marker and [[ready]] gates on
  *    it.
  *
  * In-process memo only skips the filesystem probe; cross-session and
  * cross-job reuse go through the directory + manifest.
  */
object ArtifactStore {

  /** Conf key for the artifact root (lake deployments set this). */
  val RootConf = "spark.graft.artifactRoot"

  private final case class Key(root: String, kind: String, dir: String,
      variant: String, version: Long)

  private val memo = new ConcurrentHashMap[Key, String]()

  /** The store root: `spark.graft.artifactRoot` if set, else a per-user
    * `rwx------` directory under tmpdir.
    *
    * The store's IO is java.nio (local/NFS filesystems). A URI root
    * (`s3://…`, `hdfs://…`) is REJECTED with a named error rather than
    * silently resolved as a relative local path — the failure mode that
    * would otherwise land every "shared" artifact on whichever host ran
    * the job while cross-job sharing silently broke. A lake deployment
    * points this at a shared mount; object-store roots would need the
    * Hadoop FileSystem API end to end (including an object-store commit
    * protocol in place of ATOMIC_MOVE), which this store deliberately
    * does not fake. `file://` URIs are accepted and stripped. */
  def root(spark: SparkSession): String =
    spark.conf.getOption(RootConf).map { r =>
      if (r.startsWith("file://")) r.stripPrefix("file://")
      else if (r.contains("://"))
        throw new IllegalArgumentException(
          s"graft.artifactStore: $RootConf=$r is a URI root; the store's " +
            "IO is java.nio-local (Paths.get would resolve this as a " +
            "RELATIVE LOCAL path and cross-job sharing would silently " +
            "fail). Point it at a locally mounted shared path, or mount " +
            "the object store first.")
      else r
    }.getOrElse {
      val p = Paths.get(sys.props("java.io.tmpdir"),
        s"graft-indexes-${sys.props("user.name")}")
      ensureRestricted(p)
      p.toString
    }

  private def ensureRestricted(p: Path): Unit = {
    if (!Files.exists(p)) {
      try {
        import java.nio.file.attribute.PosixFilePermissions
        Files.createDirectories(p,
          PosixFilePermissions.asFileAttribute(
            PosixFilePermissions.fromString("rwx------")))
      } catch {
        case _: UnsupportedOperationException => // non-POSIX FS
          Files.createDirectories(p)
      }
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sanitize(s: String): String = {
    val cleaned = s.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')
    if (cleaned.length > 64) cleaned.takeRight(64) else cleaned
  }

  /** Final artifact directory for (kind, dir, variant, version) under
    * `root` — human-readable tail of the corpus dir plus a 128-bit hash
    * of the exact string, so distinct dirs can never alias. */
  private[graft] def entryPath(root: String, kind: String, dir: String,
      variant: String, version: Long): Path = {
    val v = if (variant.isEmpty) "" else s"-$variant"
    Paths.get(root, kind,
      s"${sanitize(dir)}-${md5hex(dir)}$v-v$version")
  }

  /** The entry path an artifact for this identity WOULD commit to —
    * computed without probing or building. Index families use it as a
    * stable session-memo key (and as the seam an explicit install can
    * pre-seed without forcing a store build). */
  private[graft] def locate(spark: SparkSession, kind: String, dir: String,
      version: Long, variant: String = ""): String =
    entryPath(root(spark), kind, dir, variant, version).toString

  private def manifestJson(kind: String, dir: String, variant: String,
      version: Long): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    s"""{"kind":"${esc(kind)}","dir":"${esc(dir)}",""" +
      s""""variant":"${esc(variant)}","version":$version}"""
  }

  /** True iff `p` holds a COMMITTED artifact for exactly this
    * (kind, dir, variant, version) — the manifest must exist and
    * round-trip the full identity tuple. */
  private[graft] def ready(p: Path, kind: String, dir: String,
      variant: String, version: Long): Boolean = {
    val m = p.resolve("_MANIFEST.json")
    Files.exists(m) && {
      val got = new String(Files.readAllBytes(m), "UTF-8")
      got == manifestJson(kind, dir, variant, version)
    }
  }

  /** Resolve the artifact directory for (kind, dir, variant, version),
    * building it via `build` on first use. `build` receives a private
    * staging directory to write into; publication (manifest + atomic
    * rename) is handled here. Returns the committed directory path.
    *
    * Deliberately get-then-publish rather than `computeIfAbsent`: a
    * build may itself resolve ANOTHER artifact (the components
    * artifact builds over the edge artifact), and a nested
    * computeIfAbsent on one ConcurrentHashMap throws "recursive
    * update" whenever the two keys share a bin. Two threads racing the
    * same key may both build — the atomic-rename publish already makes
    * that safe (deterministic builds; loser discards its staging). */
  def resolve(spark: SparkSession, kind: String, dir: String,
      version: Long, variant: String = "")(build: String => Unit): String = {
    val r = root(spark)
    val key = Key(r, kind, dir, variant, version)
    val cached = memo.get(key)
    if (cached != null) return cached
    val fin = entryPath(r, kind, dir, variant, version)
    if (!ready(fin, kind, dir, variant, version)) {
      Files.createDirectories(fin.getParent)
      val staging = fin.getParent.resolve(
        s"${fin.getFileName}.staging-${java.util.UUID.randomUUID()}")
      try {
        Files.createDirectories(staging)
        build(staging.toString)
        Files.write(staging.resolve("_MANIFEST.json"),
          manifestJson(kind, dir, variant, version).getBytes("UTF-8"))
        // a directory at the target that FAILED the manifest check is
        // not an artifact (planted, collided, or torn by a pre-atomic
        // writer) — clear it so the atomic publish can land
        if (Files.exists(fin) && !ready(fin, kind, dir, variant, version))
          deleteRecursively(fin)
        try Files.move(staging, fin, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.AccessDeniedException |
               _: java.nio.file.FileSystemException
              if ready(fin, kind, dir, variant, version) =>
            // another JVM committed first; its artifact is
            // bit-identical (deterministic build of the same
            // snapshot) — discard ours and serve the winner's
            deleteRecursively(staging)
        }
      } finally if (Files.exists(staging)) deleteRecursively(staging)
      require(ready(fin, kind, dir, variant, version),
        s"artifact publish failed for $kind($dir, $variant, v$version)")
    }
    memo.putIfAbsent(key, fin.toString)
    fin.toString
  }

  /** Evict ONE committed entry (its directory and the memo key) — the
    * scoped form Bench's cold pass uses: it drops exactly the bench
    * corpus's own (kind, dir, variant, version) artifact and never
    * touches other corpora or jobs sharing the store. */
  def evict(spark: SparkSession, kind: String, dir: String,
      version: Long, variant: String = ""): Unit = {
    val r = root(spark)
    memo.remove(Key(r, kind, dir, variant, version))
    val p = entryPath(r, kind, dir, variant, version)
    if (Files.exists(p)) deleteRecursively(p)
  }

  /** Garbage-collect SUPERSEDED entries of one (kind, dir, variant):
    * every committed entry whose version differs from `keepVersion` is
    * removed — the store's retention sweep (the expire_snapshots role:
    * each corpus rewrite mints a fresh version-keyed entry, and without
    * a sweep the store grows one dead index per rewrite forever).
    * Scoped exactly like [[evict]]: only directories whose manifest
    * round-trips THIS (kind, dir, variant) at some other version are
    * candidates — a hash-prefix coincidence, another corpus, or a
    * staging dir in flight is never touched. Returns the number of
    * entries removed. */
  def sweep(spark: SparkSession, kind: String, dir: String,
      keepVersion: Long, variant: String = ""): Int = {
    val r = root(spark)
    val kindDir = Paths.get(r, kind)
    if (!Files.isDirectory(kindDir)) return 0
    import scala.jdk.CollectionConverters._
    val ls = Files.list(kindDir)
    val entries =
      try ls.iterator().asScala.toSeq.filter(Files.isDirectory(_))
      finally ls.close()
    var removed = 0
    entries.foreach { p =>
      val m = p.resolve("_MANIFEST.json")
      if (Files.exists(m)) {
        val got = new String(Files.readAllBytes(m), "UTF-8")
        val version = """"version":(-?\d+)""".r.findFirstMatchIn(got)
          .map(_.group(1).toLong)
        // identity check: the manifest must name exactly this
        // (kind, dir, variant) — at any version
        val mine = version.exists(v =>
          got == manifestJson(kind, dir, variant, v))
        if (mine && !version.contains(keepVersion)) {
          memo.remove(Key(r, kind, dir, variant, version.get))
          deleteRecursively(p)
          removed += 1
        }
      }
    }
    removed
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(p)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  /** Test seam: drop all memoized paths (on-disk artifacts remain —
    * use [[evict]] to remove those). */
  private[graft] def clear(): Unit = memo.clear()
}
