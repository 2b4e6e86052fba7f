package graft

/** Helpers shared across artifact-lifecycle specs — one copy, because
  * both are the kind that rot when duplicated: the err capture swaps
  * JVM-global state, and the epoch lister encodes the `e<digits>`
  * layout contract. */
object SpecSupport {

  /** Run `f` with System.err captured, returning (result, captured
    * text) — the WARN-assertion helper. The swap is JVM-GLOBAL and
    * restored in a finally; suites run single-threaded here, but do
    * not nest captures. */
  def capturingErr[T](f: => T): (T, String) = {
    val baos = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(baos, true, "UTF-8"))
    try { val r = f; (r, baos.toString("UTF-8")) }
    finally System.setErr(old)
  }

  /** Epoch-shaped children (`e<digits>`) of a local dir, by name. */
  def epochs(root: String): Set[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName)
      .filter(n => n.length > 1 && n.startsWith("e") &&
        n.drop(1).forall(_.isDigit))
      .toSet
}
