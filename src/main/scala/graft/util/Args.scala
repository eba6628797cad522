package graft.util

/** Strict `--key value` argument parsing shared by the spark-submit
  * entries: unknown keys, bare keys, odd arity and missing required keys
  * all fail fast with the job's usage text — a typo'd option must never
  * silently run the job with a default.
  */
object Args {
  def parse(args: Array[String], known: Set[String], required: Set[String],
            usage: String): Map[String, String] = {
    require(args.length % 2 == 0, s"odd argument count\n$usage")
    val m = args.grouped(2).map {
      case Array(k, v) =>
        require(k.startsWith("--"), s"expected --key, got '$k'\n$usage")
        k.drop(2) -> v
    }.toMap
    val unknown = m.keySet -- known
    require(unknown.isEmpty, s"unknown option(s): ${unknown.mkString(", ")}\n$usage")
    val missing = required -- m.keySet
    require(missing.isEmpty,
      s"missing required option(s): ${missing.map("--" + _).mkString(", ")}\n$usage")
    m
  }

  /** Three comma-separated doubles (weights/thresholds triples). Any
    * unparseable token fails loudly — silently discarding it could let a
    * malformed 4-token input masquerade as a valid triple.
    */
  def triple(s: String, what: String): (Double, Double, Double) =
    s.split(",", -1).map { tok =>
      val v = tok.trim
      scala.util.Try(v.toDouble).getOrElse(throw new IllegalArgumentException(
        s"$what: '$v' is not a number in '$s'"))
    } match {
      case Array(a, b, c) => (a, b, c)
      case _ => throw new IllegalArgumentException(
        s"$what: expected three comma-separated numbers, got '$s'")
    }
}
