package graft.util

/** Shared 64-bit mixing (splitmix64 finalizer) — ONE definition for
  * every module whose determinism contract depends on these exact
  * bits (dedup sketches, LM n-gram keys, LSH planes, synth seeds,
  * fake codec). Do not fork copies.
  */
object Hash {
  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
