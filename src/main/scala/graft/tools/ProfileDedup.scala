package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: stage-level wall profile of the dedup heavy hitters —
  * registers a listener and prints per-job wall/desc so the expensive
  * subtree is identified empirically (guide §1). Not part of the driver
  * contract. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tableNames.foreach(t =>
      graft.GraftSession.table(spark, sfDir, t).limit(1000).count())

    @volatile var stages = List.empty[(Int, String, Long, Int)]
    val stageDetail = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val detail = Option(stageDetail.get(si.stageId)).getOrElse("")
        stages ::= ((si.stageId, (si.name.takeWhile(_ != '\n') + " | " + detail).take(170),
          wall, si.numTasks))
      }
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // last RDD in the job's final stage names the physical operator
        js.stageInfos.foreach { si =>
          val rddNames = si.rddInfos.map(_.name).distinct.mkString(",").take(70)
          stageDetail.put(si.stageId, rddNames)
        }
      }
    })
    val name = args.headOption.getOrElse("d_minhash_est")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    (1 to runs).foreach { i =>
      stages = Nil
      graft.sources.FsCalls.phaseWallReset()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[profdedup] $name run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      val pw = graft.sources.FsCalls.phaseWall().toSeq.sortBy(-_._2)
      if (pw.nonEmpty) println("[profdedup] phase wall: " + pw.map {
        case (k, v) => f"$k=$v%.2fs" }.mkString(" "))
      spark.catalog.clearCache()
      if (i == runs) {
        println(f"[profdedup] stages=${stages.size} wallSum=${stages.map(_._3).sum / 1e3}%.2f s")
        stages.sortBy(-_._3).take(25).foreach { case (id, n, w, t) =>
          println(f"[profdedup]   stage $id%5d $w%6d ms tasks=$t%3d  $n")
        }
      }
    }
    spark.stop()
  }
}
