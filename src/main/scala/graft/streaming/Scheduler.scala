package graft.streaming

/**
 * The reference's operational driver (`scheduler.py:10-51`): an optional
 * immediate run, then a fixed-period re-run of the ingest/update job,
 * forever. The Spark-native job it drives is batch-incremental —
 * `Engine.ingest` + `Engine.updateIncremental` (or a
 * `Trigger.AvailableNow` stream restart): every firing processes exactly
 * what accumulated since the last one and is idempotent, so an overlapping
 * or repeated firing is harmless — the property `scheduler.py` relies on
 * MongoDB's per-row upsert for.
 *
 * The loop itself is deliberately driver-side and dumb (so was the
 * reference's: `schedule.run_pending()` + `time.sleep(1)`,
 * scheduler.py:48-51); the distributed work lives entirely inside the job.
 * `sleep` is injectable so tests exercise the schedule without waiting
 * wall-clock days.
 */
object Scheduler {

  /** `scheduler.py:22-30`'s period table; "month" is approximated as 30
    * days exactly as the reference does (`schedule.every(30).day`). */
  def periodSeconds(period: String): Long = period match {
    case "day" => 86400L
    case "week" => 7L * 86400L
    case "month" => 30L * 86400L
    case other => throw new IllegalArgumentException(
      s"Invalid period specified: '$other'. Choose 'day', 'week', or 'month'.")
  }

  /**
   * Run `job` under the scheduler contract: once immediately when `initRun`
   * (`scheduler.py:42-43`), then once per period, until `maxRuns` total
   * firings (pass `Long.MaxValue` for the daemon form). A failing run is
   * reported and the schedule stays alive (`scheduler.py:14-16`). Returns
   * the number of firings. The job receives its 0-based run ordinal.
   */
  def run(period: String, initRun: Boolean, maxRuns: Long, job: Long => Unit,
          sleep: Long => Unit = millis => Thread.sleep(millis)): Long = {
    val periodMs = periodSeconds(period) * 1000L
    var runs = 0L
    def fire(): Unit = {
      try job(runs)
      catch {
        case e: Exception =>
          System.err.println(s"[ERROR] scheduled run $runs failed: $e")
      }
      runs += 1
    }
    if (initRun && runs < maxRuns) fire()
    while (runs < maxRuns) { sleep(periodMs); fire() }
    runs
  }

  /** [[run]] configured from the engine config's `scheduler.*` block
    * (`config.yml:97-100` — `init_run`, `period`). */
  def run(cfg: graft.EngineConfig, maxRuns: Long, job: Long => Unit,
          sleep: Long => Unit): Long =
    run(cfg.schedulerPeriod, cfg.schedulerInitRun, maxRuns, job, sleep)
}
