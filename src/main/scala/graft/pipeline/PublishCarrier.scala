package graft.pipeline

/** Storage seam for the sharded delta publish (VERDICT r12 item 1).
  *
  * The delta-carry machinery ([[PublishState]], the
  * [[CurationRun]] publish tails) needs a small set of file
  * operations: carry an unchanged shard file from the previous
  * publish into the new one, list a publish dir's files, move a
  * staged file into place, clear/create dirs, and read/write the
  * tiny meta/totals text artifacts. r11/r12 hard-wired those to
  * `java.nio.file` — hard links plus local listings — which is the
  * right LOCAL fast path but cannot run where 100 TB lives: object
  * stores (the reference's own storage is GCS —
  * `/root/reference/terraform/main.tf`, `README.md:98-106`) have no
  * hard links. This trait is the seam; two implementations ship:
  *
  *  - [[PublishCarrier.Posix]] — `java.nio.file`: `createLink` carry
  *    (zero bytes rewritten), local listings, atomic temp+move text
  *    writes. The single-node/NFS fast path and the test default.
  *  - [[PublishCarrier.hadoop]] — `org.apache.hadoop.fs.FileSystem`
  *    under the session's Hadoop conf: the carry is a COPY
  *    (`FileUtil.copy`) and every listing/move/delete goes through
  *    the FS client, so the same publish code runs against any
  *    Hadoop-supported store (hdfs://, s3a://, gs:// with the
  *    connector on the classpath; local file:// in the specs). On a
  *    store with server-side copy (S3 CopyObject, GCS rewrite) a
  *    production deployment would override [[carryFile]] with the
  *    store's metadata-only copy — the interface point is exactly
  *    that one operation. Copied bytes are COUNTED
  *    ([[bytesCarried]]/[[filesCarried]]) so the "re-point vs copy"
  *    cost is a measured fact (ScaleStress records it), not a claim.
  *
  * Both carriers produce BIT-EQUAL publishes (DeltaPublishSpec pins
  * artifact equality across carriers); only the carry COST differs.
  * Parquet data writes themselves go through Spark (already
  * FS-agnostic) — the carrier owns only the file-level carry/list/
  * move/meta operations Spark has no operator for.
  */
trait PublishCarrier {
  /** Short tag for logs/records ("posix" / "hadoop-copy"). */
  def name: String

  /** Carry one unchanged published file from the previous publish
    * into the new one — hard link (posix) or copy (hadoop). */
  def carryFile(src: String, dst: String): Unit

  /** File NAMES (not paths) directly under `path`; empty if the dir
    * does not exist. Non-recursive — publish artifact dirs are flat. */
  def listFileNames(path: String): Seq[String]

  /** Subdirectory NAMES directly under `path` (the staged
    * partitionBy commit enumerates its `__pub_shard=` dirs); empty if
    * the dir does not exist. */
  def listDirNames(path: String): Seq[String]

  /** Move one file (staging commit). Same-store rename semantics. */
  def moveFile(src: String, dst: String): Unit

  /** Delete `path` recursively if it exists, then recreate it empty. */
  def clearDir(path: String): Unit

  /** Delete `path` recursively if it exists (no recreate). */
  def deleteDir(path: String): Unit

  /** Delete one file if it exists (idempotent — marker retraction). */
  def deleteFile(path: String): Unit

  def createDirs(path: String): Unit

  def exists(path: String): Boolean

  def readText(path: String): String

  /** Land a small text artifact. Posix stages through a temp file +
    * atomic move; object-store PUTs are already all-or-nothing. */
  def writeText(path: String, content: String): Unit

  /** Bytes physically rewritten by [[carryFile]] since construction —
    * 0 for the link carrier, the copied volume for the copy carrier. */
  def bytesCarried: Long

  /** Files carried since construction (both carriers count). */
  def filesCarried: Long
}

object PublishCarrier {

  /** The local fast path: hard-link carry (zero bytes rewritten),
    * `java.nio.file` listings, temp+atomic-move text writes. A
    * SINGLETON, so its [[filesCarried]] counter is process-global
    * (unlike a fresh [[hadoop]] instance's per-instance counters) —
    * fine for its only use (links are free; the counter is
    * informational), but a per-chain count needs a hadoop-style
    * instance. */
  object Posix extends PublishCarrier {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    private val nFiles = new java.util.concurrent.atomic.AtomicLong
    val name = "posix"
    def carryFile(src: String, dst: String): Unit = {
      Files.createLink(Paths.get(dst), Paths.get(src))
      nFiles.incrementAndGet(); ()
    }
    def listFileNames(path: String): Seq[String] = {
      val p = Paths.get(path)
      if (!Files.exists(p)) return Nil
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.getFileName.toString).toSeq
      } finally s.close()
    }
    def listDirNames(path: String): Seq[String] = {
      val p = Paths.get(path)
      if (!Files.exists(p)) return Nil
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString).toSeq
      } finally s.close()
    }
    def moveFile(src: String, dst: String): Unit = {
      Files.move(Paths.get(src), Paths.get(dst)); ()
    }
    def clearDir(path: String): Unit = {
      deleteDir(path)
      Files.createDirectories(Paths.get(path)); ()
    }
    def deleteDir(path: String): Unit = {
      val p = Paths.get(path)
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
        finally s.close()
      }
    }
    def createDirs(path: String): Unit = {
      Files.createDirectories(Paths.get(path)); ()
    }
    def deleteFile(path: String): Unit = {
      Files.deleteIfExists(Paths.get(path)); ()
    }
    def exists(path: String): Boolean = Files.exists(Paths.get(path))
    def readText(path: String): String =
      Files.readString(Paths.get(path))
    def writeText(path: String, content: String): Unit = {
      val p = Paths.get(path)
      Files.createDirectories(p.getParent)
      // Temp in the SAME dir (atomic move needs one filesystem);
      // ATOMIC_MOVE so a reader never sees a half-written meta file.
      val tmp = p.resolveSibling(s".${p.getFileName}.tmp")
      Files.writeString(tmp, content)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    // Hard links rewrite zero bytes — the whole point of the carry.
    def bytesCarried: Long = 0L
    def filesCarried: Long = nFiles.get
  }

  /** Object-store-shaped carrier over `org.apache.hadoop.fs.FileSystem`
    * (per-path `getFileSystem`, so mixed schemes in one publish
    * resolve correctly). The carry is a byte copy — the portable
    * lower bound; a store-specific deployment overrides [[carryFile]]
    * with its server-side copy/manifest re-point. */
  def hadoop(conf: org.apache.hadoop.conf.Configuration): PublishCarrier =
    new HadoopCopyCarrier(conf)

  def hadoop(spark: org.apache.spark.sql.SparkSession): PublishCarrier =
    hadoop(spark.sparkContext.hadoopConfiguration)

  private final class HadoopCopyCarrier(
      conf: org.apache.hadoop.conf.Configuration) extends PublishCarrier {
    import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
    private val nBytes = new java.util.concurrent.atomic.AtomicLong
    private val nFiles = new java.util.concurrent.atomic.AtomicLong
    private def fs(p: Path): FileSystem = p.getFileSystem(conf)
    val name = "hadoop-copy"
    def carryFile(src: String, dst: String): Unit = {
      val sp = new Path(src); val dp = new Path(dst)
      val sfs = fs(sp)
      val n = sfs.getFileStatus(sp).getLen
      FileUtil.copy(sfs, sp, fs(dp), dp,
        /* deleteSource = */ false, /* overwrite = */ false, conf)
      nBytes.addAndGet(n); nFiles.incrementAndGet(); ()
    }
    def listFileNames(path: String): Seq[String] = {
      val p = new Path(path)
      val f = fs(p)
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.getName)
    }
    def listDirNames(path: String): Seq[String] = {
      val p = new Path(path)
      val f = fs(p)
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    }
    def moveFile(src: String, dst: String): Unit = {
      val sp = new Path(src); val dp = new Path(dst)
      require(fs(sp).rename(sp, dp), s"rename failed: $src -> $dst")
    }
    def clearDir(path: String): Unit = {
      deleteDir(path); createDirs(path)
    }
    def deleteDir(path: String): Unit = {
      val p = new Path(path)
      val f = fs(p)
      if (f.exists(p)) { f.delete(p, true); () }
    }
    def createDirs(path: String): Unit = {
      val p = new Path(path)
      fs(p).mkdirs(p); ()
    }
    def deleteFile(path: String): Unit = {
      val p = new Path(path)
      val f = fs(p)
      if (f.exists(p)) { f.delete(p, false); () }
    }
    def exists(path: String): Boolean = {
      val p = new Path(path)
      fs(p).exists(p)
    }
    def readText(path: String): String = {
      val p = new Path(path)
      val in = fs(p).open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    def writeText(path: String, content: String): Unit = {
      // Temp + rename-OVERWRITE, like the Posix carrier: a crash
      // mid-create on hdfs:// or file:// would otherwise leave a
      // TRUNCATED meta/pointer file that crashes readers instead of
      // self-healing (round-13 review finding #2). FileContext's
      // rename(OVERWRITE) is the atomic form; object stores without
      // atomic rename already give all-or-nothing PUTs on close, and
      // their connectors implement rename as copy+delete — still
      // never a half-written destination.
      val p = new Path(path)
      val tmp = new Path(p.getParent, s".${p.getName}.tmp")
      val f = fs(p)
      f.mkdirs(p.getParent)
      val out = f.create(tmp, /* overwrite = */ true)
      try out.write(content.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, conf)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    def bytesCarried: Long = nBytes.get
    def filesCarried: Long = nFiles.get
  }
}
