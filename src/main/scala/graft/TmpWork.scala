package graft

/**
 * Run-scoped tmpfs temp plane for the bench/verify harness mains.
 *
 * Every streaming harness checkpoint (`Files.createTempDirectory`)
 * and Spark's ephemeral stream checkpoints resolve through
 * `java.io.tmpdir`; an HDFS-backed state store commits each
 * micro-batch through many small create/rename/fsync operations, and
 * on an ext4 /tmp those fsyncs are the dominant PER-QUERY CONSTANT of
 * the streaming family in the idle sweep (r13 verdict: 6 of the 8
 * slowest idle entries were st* with no code change — the cost was
 * the harness, not the operators). Pointing the temp plane at a
 * tmpfs (/dev/shm) makes the commits memory-speed while leaving the
 * operators untouched.
 *
 * Shuffle/spill files deliberately STAY on disk: callers pass the
 * original tmpdir to `spark.local.dir` (see [[install]]'s return) —
 * shuffle writes are large and sequential (the page cache already
 * absorbs them) and can reach multi-GB at sf1, which would contend
 * with executor heap for RAM on tmpfs. Checkpoints are small and
 * fsync-bound — the opposite profile.
 *
 * This is a HARNESS concern only: production streaming checkpoints
 * belong on durable storage (HDFS/S3), never tmpfs; nothing under
 * `graft.ops`/`graft.streaming` references this object.
 */
object TmpWork {

  /** Original `java.io.tmpdir` before any [[install]] — pass this to
    * `spark.local.dir` so shuffle stays on disk. */
  val diskTmp: String = System.getProperty("java.io.tmpdir", "/tmp")

  /**
   * Point `java.io.tmpdir` at a fresh run-scoped directory under
   * /dev/shm when it is writable with >= 16 GiB free; no-op (returns
   * false) otherwise. Call BEFORE the SparkSession is created. The
   * directory is removed on JVM exit.
   */
  def install(prefix: String): Boolean = {
    val shm = new java.io.File("/dev/shm")
    if (sys.env.get("SPARK_GRAFT_NO_SHM").contains("1")) false
    else if (!(shm.isDirectory && shm.canWrite &&
        shm.getUsableSpace >= 16L * (1L << 30))) false
    else {
      val dir = java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
      System.setProperty("java.io.tmpdir", dir.toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val cs = f.listFiles()
          if (cs != null) cs.foreach(rm)
          f.delete(): Unit
        }
        rm(dir.toFile)
      }))
      true
    }
  }
}
