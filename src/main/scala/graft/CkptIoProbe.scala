package graft

/** Dev probe: times the streaming checkpoint-write primitive the WAL /
  * commit / state-store logs use (CheckpointFileManager.createAtomic →
  * write → close/rename), plus raw java.nio equivalents, on the same
  * tmpdir — attributes the measured ~32 ms per offset-log write
  * (GRAFT_STREAM_PROGRESS) to the Hadoop local-FS layer vs the disk.
  */
object CkptIoProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = java.nio.file.Files.createTempDirectory("ckptprobe").toString
    val hconf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(dir)
    val fm = org.apache.spark.sql.execution.streaming.checkpointing
      .CheckpointFileManager.create(path, hconf)
    println(s"manager=${fm.getClass.getName} dir=$dir")
    val payload = ("v1\n" + "x" * 300).getBytes
    (1 to 20).foreach { i =>
      val t0 = System.nanoTime()
      val out = fm.createAtomic(
        new org.apache.hadoop.fs.Path(path, s"f$i"), false)
      out.write(payload); out.close()
      val t1 = System.nanoTime()
      val ex = fm.exists(new org.apache.hadoop.fs.Path(path, s"f$i"))
      val t2 = System.nanoTime()
      val ls = fm.list(path).length
      val t3 = System.nanoTime()
      println(f"op$i%02d createAtomic=${(t1 - t0) / 1e6}%.1f ms " +
        f"exists=${(t2 - t1) / 1e6}%.1f ms list($ls)=${(t3 - t2) / 1e6}%.1f ms")
    }
    // raw NIO control on the same mount
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val tmp = java.nio.file.Paths.get(dir, s"nio$i.tmp")
      java.nio.file.Files.write(tmp, payload)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, s"nio$i"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      println(f"nio$i write+move=${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    spark.stop()
  }
}
