package graft.versionrange

/**
 * NuGet range semantics, matching the reference's NuGet resolver
 * (`src/main/java/Repositories/Nuget/NugetVersionRangeResolver.java:11-300`).
 *
 * The only reference resolver with a real interval representation: bracket
 * intervals `[a,b]`/`(a,b)` with either bound optional, bare `1.2.3` =
 * minimum-inclusive, floating `1.*`/`*` -> `[prefix.0, prefix+1)`.
 * Versions compare as arbitrary-arity zero-extended int vectors with an
 * optional `-suffix` compared lexicographically; a version *without* suffix
 * sorts above the same version *with* one (reference `SimpleVersion:186-299`).
 */
class NugetRangeResolver extends RangeResolver {

  import NugetRangeResolver._

  override def isValid(spec: String): Boolean =
    spec.trim.nonEmpty &&
      (spec.startsWith("(") || spec.startsWith("[") ||
        Character.isDigit(spec.charAt(0)) || spec.charAt(0) == '*')

  /** Everything that is not `[<version>]` is a range (reference `:15-18`). */
  override def isRange(spec: String): Boolean =
    !spec.startsWith("[") || !spec.endsWith("]") || spec.contains(",")

  override def normalizeFixed(spec: String): String =
    if (spec.startsWith("[") && spec.endsWith("]")) spec.substring(1, spec.length - 1)
    else spec

  /** Fixed refs require suffix equality too: `[1.0.0-abc]` matches only
    * `1.0.0-abc` (reference override `:54-59`). */
  override protected def fixedRangeEquals(range: String, version: String): Boolean =
    NugetVersion(range) == NugetVersion(version)

  override def versionInRange(spec: String, version: String): Boolean =
    rangePredicate(spec)(version)

  override def rangePredicate(spec: String): String => Boolean = {
    val range = parseRange(spec)
    version => inInterval(range, version)
  }

  private def inInterval(range: Interval, version: String): Boolean = {
    val v = NugetVersion(version)
    val lowerOk = range.lower match {
      case None => true
      case Some(lo) =>
        !(v < lo) && !(!range.lowerInclusive && v.sameNumbers(lo))
    }
    lowerOk && (range.upper match {
      case None => true
      case Some(hi) =>
        !(v > hi) && !(!range.upperInclusive && v.sameNumbers(hi))
    })
  }

  /** Parse a range spec into an interval (reference `:62-122`). */
  private[versionrange] def parseRange(spec: String): Interval = {
    if (spec.contains("*")) return floatingRange(spec)

    var s = spec.trim
    val first = s.charAt(0)
    if (Character.isDigit(first)) {
      // Bare '1.2.3' means minimum-inclusive.
      Interval(Some(NugetVersion(s)), None, lowerInclusive = true, upperInclusive = false)
    } else {
      val lowerInc = first match {
        case '(' => false
        case '[' => true
        case _   => throw new IllegalArgumentException(s"Invalid NuGet version range: $spec")
      }
      s = s.substring(1)
      val upperInc = s.charAt(s.length - 1) match {
        case ')' => false
        case ']' => true
        case _   => throw new IllegalArgumentException(s"Invalid NuGet version range: $spec")
      }
      s = s.substring(0, s.length - 1).trim
      val parts = s.split(",")
      val (lo, hi): (Option[NugetVersion], Option[NugetVersion]) =
        if (s.trim == ",") (None, None)
        else if (s.charAt(0) == ',' && parts.length == 1)
          (None, Some(NugetVersion(parts(0).trim)))
        else if (s.charAt(s.length - 1) == ',' && parts.length == 1)
          (Some(NugetVersion(parts(0))), None)
        else if (parts.length == 2)
          (if (parts(0).trim.isEmpty) None else Some(NugetVersion(parts(0).trim)),
           if (parts(1).trim.isEmpty) None else Some(NugetVersion(parts(1).trim)))
        else throw new IllegalArgumentException(s"Invalid NuGet version range: $spec")
      Interval(lo, hi, lowerInc, upperInc)
    }
  }

  /** `1.2.*` -> `[1.2.0, 1.3.0)`; `*` -> `[0, )` (reference `:124-164`). */
  private def floatingRange(spec: String): Interval = {
    val parts = spec.trim.split("\\.")
    var starIndex = -1
    val lower = new StringBuilder
    var i = 0
    var done = false
    while (i < parts.length && !done) {
      val cur = parts(i).trim
      if (i != 0) lower.append(".")
      if (cur == "*") { lower.append("0"); starIndex = i; done = true }
      else lower.append(cur)
      i += 1
    }
    val lo = NugetVersion(lower.toString)
    val hi =
      if (starIndex > 0) Some(NugetVersion(lower.toString).bumpAt(starIndex - 1))
      else None
    Interval(Some(lo), hi, lowerInclusive = true, upperInclusive = false)
  }
}

object NugetRangeResolver {
  final case class Interval(lower: Option[NugetVersion], upper: Option[NugetVersion],
                            lowerInclusive: Boolean, upperInclusive: Boolean)
}

/**
 * Arbitrary-arity dot-separated int version with optional `-suffix`
 * (reference `SimpleVersion`, `NugetVersionRangeResolver.java:186-299`):
 * numeric parts zero-extended for comparison, non-numeric parts parse to 0,
 * suffixes compare lexicographically, and no-suffix > with-suffix.
 */
final case class NugetVersion(parts: Vector[Int], suffix: Option[String]) extends Ordered[NugetVersion] {

  def sameNumbers(o: NugetVersion): Boolean = {
    val n = math.max(parts.length, o.parts.length)
    (0 until n).forall(i => parts.applyOrElse(i, (_: Int) => 0) == o.parts.applyOrElse(i, (_: Int) => 0))
  }

  override def compare(o: NugetVersion): Int = {
    val n = math.max(parts.length, o.parts.length)
    var i = 0
    while (i < n) {
      val a = if (i < parts.length) parts(i) else 0
      val b = if (i < o.parts.length) o.parts(i) else 0
      if (a > b) return 1
      if (a < b) return -1
      i += 1
    }
    (suffix, o.suffix) match {
      case (None, Some(_))    => 1
      case (None, None)       => 0
      case (Some(_), None)    => -1
      case (Some(a), Some(b)) => a.compareTo(b)
    }
  }

  /** Used when computing the exclusive upper bound of a floating version. */
  def bumpAt(index: Int): NugetVersion =
    if (index >= 0 && index < parts.length) copy(parts = parts.updated(index, parts(index) + 1))
    else this

  /** Equality = numeric parts AND suffix (reference `equals:250-259`). */
  override def equals(other: Any): Boolean = other match {
    case o: NugetVersion => sameNumbers(o) && suffix == o.suffix
    case _               => false
  }
  override def hashCode(): Int = (parts.reverse.dropWhile(_ == 0), suffix).hashCode()
}

object NugetVersion {
  def apply(raw: String): NugetVersion = {
    val verAndSuffix = raw.split("-")
    val suffix = if (verAndSuffix.length > 1) Some(verAndSuffix(1)) else None
    val parts = verAndSuffix(0).split("\\.").toVector.map { p =>
      try java.lang.Integer.parseInt(p)
      catch { case _: NumberFormatException => 0 }
    }
    NugetVersion(parts, suffix)
  }
}
