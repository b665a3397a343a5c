package graft.tools

/** Shared wall-clock helper for the decade probes — one definition so a
  * methodology change (clock source, warm-up policy) lands everywhere
  * at once instead of in six private copies.
  */
object ProbeTiming {
  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
