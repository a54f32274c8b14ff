package graft.linalg

/** One-time, single-threaded initialization of f2j LAPACK's machine
  * constants.
  *
  * `org.netlib.lapack.Dlamch.dlamch` lazy-initializes its constants in
  * UNSYNCHRONIZED static fields (verified in the arpack_combined_all
  * bytecode: `if (first) { dlamc2(...); putstatic base/eps/sfmin/...;
  * first = false }` — no lock, no volatile). When many executor tasks
  * make their first LAPACK call concurrently (local[32] runs the first
  * parallel QR as 32 simultaneous first calls), a thread can observe
  * half-written constants. DLARFG's denormal-rescaling loop
  * (`IF (ABS(BETA).LT.SAFMIN) GO TO 10` — unbounded in this LAPACK
  * vintage) then spins forever rescaling by a garbage RSAFMN.
  *
  * Observed live (r16, 2026-08-18, plans/r16/lapack_dlarfg_hang_jstack
  * .txt): one tsqr partition-QR task burned 50 CPU-minutes inside
  * Dlarfg/Dscal on a 15625x32 matrix (a ~10 ms job) with a healthy
  * 1 GB code cache and empty compile queues, while its 31 sibling
  * tasks finished instantly.
  *
  * Forcing every DLAMCH query once on the driver before any parallel
  * LAPACK work publishes fully-written constants (the statics are
  * written once, then only ever read), closing the race for the JVM's
  * lifetime. Referenced from the Bench/Verify session builders and the
  * linalg/ml entry points that run LAPACK inside tasks. */
object LapackInit {
  lazy val forced: Unit = {
    // every CMACH code DLAMCH accepts — each touches the same one-shot
    // static init; calling all of them leaves nothing lazy
    Seq("E", "S", "B", "P", "N", "R", "M", "U", "L", "O")
      .foreach(org.netlib.lapack.Dlamch.dlamch)
    ()
  }
}
