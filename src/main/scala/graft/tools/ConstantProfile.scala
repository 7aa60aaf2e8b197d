package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Attribute the per-query constant (VERDICT r16 #5): the sf≤0.1 bench is
  * constant-dominated (~2–6 s/query while data cost is milliseconds), and
  * round-over-round reads over-weight sub-second movers unless that
  * constant is split into its parts. This main runs one declared query at
  * several scale factors and prints, per (sf, run):
  *
  *   - `wall_s` — end-to-end latency of build + execute + collect;
  *   - `plan_ms` — Catalyst phase times of the FINAL collect
  *     (`QueryExecution.tracker.phases`: analysis/optimization/planning);
  *     eager snapshot barriers inside the query build their own plans,
  *     which show up in wall but not here — the gap is itself evidence;
  *   - `jobs` / `stages` / `tasks` — scheduler units launched (every
  *     `Stage.snapshot` barrier and store write adds jobs; each stage
  *     costs a fixed scheduling round-trip);
  *   - `task_run_s` — Σ executor run time across tasks: the part of wall
  *     that is actual work, parallelized over the cores;
  *   - `task_p50_ms` / `task_p99_ms` / `task_max_ms` — the PER-TASK run
  *     time distribution across the whole run (VERDICT r17 #2): a uniform
  *     superlinearity (every task slow — the object-agg sort-fallback
  *     mechanism) shows p50 ≈ max, while a fat-key straggler (one task
  *     sorting alone while the rest idle) shows max ≫ p99 ≥ p50 — the two
  *     r17 mechanisms separate in ONE run instead of thread-dump
  *     archaeology;
  *   - `gc_s`, `shuffle_fetch_wait_s`, `shuffle_write_s` — the usual
  *     suspects inside task run time;
  *   - `sched_s` = wall − task_run/cores − plan: the residual the
  *     scheduler + driver round-trips own. With 32 cores and KB-scale
  *     data, `sched_s ≈ wall` is the constant-domination signature: the
  *     fix (if any) is fewer stages/jobs, not faster operators.
  *
  * Stage detail (`SPARK_GRAFT_STAGE_DETAIL=1`) prints the top stages by
  * Σ task run time, each with its own task-time med/p99/max — the
  * per-stage form of the same mechanism split.
  *
  * Output: one JSON line per (sf, run) plus a `min` summary per sf —
  * BENCH_NOTES-ready. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.ConstantProfile q80_dedup_clusters"
  */
object ConstantProfile {

  private class StatsListener extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val runTimeMs = new AtomicLong(0L)
    val gcTimeMs = new AtomicLong(0L)
    val fetchWaitMs = new AtomicLong(0L)
    val shuffleWriteNs = new AtomicLong(0L)
    val shuffleWriteBytes = new AtomicLong(0L)
    val spillDiskBytes = new AtomicLong(0L)
    // straggler evidence: the single largest stage by executorRunTime,
    // and that stage's wall — a skew-bound plan shows one stage owning
    // most of the run time with runtime ≫ tasks×mean
    val maxStageRunMs = new AtomicLong(0L)
    // per-TASK run times, keyed by stageId — the distribution that
    // separates uniform-slow from one-straggler (cheap: one boxed pair
    // per task; local-mode runs are thousands of tasks at most)
    val taskRunMs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    // per-stage identity for the skew hunt (SPARK_GRAFT_STAGE_DETAIL=1):
    // (runTimeMs, stageId, name, numTasks, rdd lineage names)
    val stageDetail = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, String, Int, String)]()
    override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      Option(te.taskMetrics).foreach(m =>
        taskRunMs.add((te.stageId, m.executorRunTime)))
      ()
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(sc.stageInfo.numTasks)
      if (sys.env.get("SPARK_GRAFT_STAGE_DETAIL").contains("1"))
        stageDetail.add((
          Option(sc.stageInfo.taskMetrics).map(_.executorRunTime).getOrElse(0L),
          sc.stageInfo.stageId, sc.stageInfo.name, sc.stageInfo.numTasks,
          sc.stageInfo.rddInfos.map(_.name).mkString(">")))
      Option(sc.stageInfo.taskMetrics).foreach { m =>
        runTimeMs.addAndGet(m.executorRunTime)
        gcTimeMs.addAndGet(m.jvmGCTime)
        fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
        shuffleWriteNs.addAndGet(m.shuffleWriteMetrics.writeTime)
        shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillDiskBytes.addAndGet(m.diskBytesSpilled)
        maxStageRunMs.getAndUpdate(cur => math.max(cur, m.executorRunTime))
      }
      ()
    }
    /** Listener events post async (the bus drain API is private[spark]);
      * a fixed sleep misses late events on a loaded machine and lets
      * in-flight events bleed across reset() — skewing exactly the
      * constants this tool exists to split (ADVICE r17). Poll instead:
      * done when the counter snapshot is unchanged for `stableFor`
      * consecutive polls, bounded by `maxWaitMs`.
      */
    def quiesce(maxWaitMs: Long = 5000L, stableFor: Int = 3): Unit = {
      def snap = (jobs.get, stages.get, tasks.get, runTimeMs.get, taskRunMs.size)
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var last = snap
      var stable = 0
      while (stable < stableFor && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val cur = snap
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    }
    def reset(): Unit = {
      // drain in-flight events from the PREVIOUS window first, or they
      // land after the zeroing and inflate the next window
      quiesce()
      jobs.set(0); stages.set(0); tasks.set(0)
      runTimeMs.set(0); gcTimeMs.set(0); fetchWaitMs.set(0); shuffleWriteNs.set(0)
      shuffleWriteBytes.set(0); spillDiskBytes.set(0); maxStageRunMs.set(0)
      taskRunMs.clear()
      stageDetail.clear()
    }
  }

  private def r3(v: Double): Double =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Nearest-rank percentile of an already-SORTED sequence (empty → 0). */
  private def pct(sorted: IndexedSeq[Long], p: Double): Long =
    if (sorted.isEmpty) 0L
    else sorted(math.min(sorted.length - 1, math.ceil(p * sorted.length).toInt - 1).max(0))

  def main(args: Array[String]): Unit = {
    val qname = args.lift(0).getOrElse("q80_dedup_clusters")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDirs = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    require(graft.SparkEntry.queries.contains(qname), s"unknown query $qname")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StatsListener
    spark.sparkContext.addSparkListener(listener)
    val q = graft.SparkEntry.queries(qname)
    val nCores = cpus.toInt
    sfDirs.foreach { dir =>
      // warm-up once per sf (parquet footer cache, codegen cache) so the
      // measured runs see the same steady state the bench does
      q(spark, dir).collect()
      val lines = (1 to runs).map { run =>
        listener.reset()
        val t0 = System.nanoTime()
        val df = q(spark, dir)
        df.collect()
        val wallS = (System.nanoTime() - t0) / 1e9
        // let the async bus land this run's stage/task events before
        // reading the counters (outside the timed window)
        listener.quiesce()
        import scala.jdk.CollectionConverters._
        val perTask = listener.taskRunMs.asScala.toVector
        val sortedTask = perTask.map(_._2).sorted
        val planMs = df.queryExecution.tracker.phases.values.map(p => p.endTimeMs - p.startTimeMs).sum
        val taskRunS = listener.runTimeMs.get / 1e3
        val schedS = wallS - taskRunS / nCores - planMs / 1e3
        val j = s"""{"query":"$qname","sf":"${dir.split('/').last}","run":$run,""" +
          s""""wall_s":${r3(wallS)},"plan_ms":$planMs,"jobs":${listener.jobs.get},""" +
          s""""stages":${listener.stages.get},"tasks":${listener.tasks.get},""" +
          s""""task_run_s":${r3(taskRunS)},"gc_s":${r3(listener.gcTimeMs.get / 1e3)},""" +
          s""""task_p50_ms":${pct(sortedTask, 0.50)},"task_p99_ms":${pct(sortedTask, 0.99)},""" +
          s""""task_max_ms":${sortedTask.lastOption.getOrElse(0L)},""" +
          s""""shuffle_fetch_wait_s":${r3(listener.fetchWaitMs.get / 1e3)},""" +
          s""""shuffle_write_s":${r3(listener.shuffleWriteNs.get / 1e9)},""" +
          s""""shuffle_write_mb":${r3(listener.shuffleWriteBytes.get / 1e6)},""" +
          s""""spill_disk_mb":${r3(listener.spillDiskBytes.get / 1e6)},""" +
          s""""max_stage_run_s":${r3(listener.maxStageRunMs.get / 1e3)},""" +
          s""""sched_s":${r3(schedS)}}"""
        println(j)
        if (sys.env.get("SPARK_GRAFT_STAGE_DETAIL").contains("1")) {
          val byStage = perTask.groupBy(_._1).view
            .mapValues(_.map(_._2).sorted).toMap
          listener.stageDetail.asScala.toSeq.sortBy(-_._1).take(6)
            .foreach { case (ms, sid, name, nt, rdds) =>
              val ts = byStage.getOrElse(sid, Vector.empty)
              println(s"""STAGE ${r3(ms / 1e3)}s tasks=$nt """ +
                s"""task_med_ms=${pct(ts, 0.50)} task_p99_ms=${pct(ts, 0.99)} """ +
                s"""task_max_ms=${ts.lastOption.getOrElse(0L)} "$name" rdds=$rdds""")
            }
        }
        (wallS, j)
      }
      println(s"""{"min_summary":true,"query":"$qname","sf":"${dir.split('/').last}","min_wall_s":${r3(lines.map(_._1).min)}}""")
    }
    spark.stop()
  }
}
