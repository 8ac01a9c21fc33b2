package graft.lake

/** Shared `--key value` CLI parsing for the lake jobs (the
  * getResolvedOptions stand-in). Rejects unknown keys — for jobs that
  * delete data, a typo'd flag silently falling back to a default is
  * worse than an error. */
private[lake] object CliArgs {

  def parse(argv: Array[String], allowed: Set[String]): Map[String, String] = {
    val m = argv.grouped(2).map {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.drop(2).toLowerCase -> v
      case other => throw new IllegalArgumentException(
        s"expected --key value pairs, got: ${other.mkString(" ")}")
    }.toMap
    val unknown = m.keySet -- allowed
    require(unknown.isEmpty,
      s"unknown flags: ${unknown.toSeq.sorted.map("--" + _).mkString(", ")} " +
        s"(allowed: ${allowed.toSeq.sorted.map("--" + _).mkString(", ")})")
    m
  }

  def required(m: Map[String, String], k: String): String =
    m.getOrElse(k, throw new IllegalArgumentException(s"missing required --$k"))
}
