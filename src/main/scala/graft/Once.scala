package graft

/** Per-key build-once memo cell. Memoizing maps hold their monitor only
  * long enough to INSTALL a cell; the build itself runs under the
  * cell's own lazy-val lock. Two different keys therefore build
  * concurrently (Verify's thread pool, the explicit d_build /
  * s_index_build fan-out), while one key still builds exactly once —
  * the previous pattern (building inside the map's `synchronized`)
  * serialized every family build behind one object monitor. A build
  * that throws leaves the cell uninitialized, so the next caller
  * retries instead of caching the failure. */
final class Once[T](f: () => T) {
  lazy val value: T = f()
}
