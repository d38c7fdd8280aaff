package graft.versionrange

/**
 * Version-range resolution library. Pure Scala, no Spark dependency.
 *
 * Re-implements, bit-for-bit, the range-matching semantics of the reference
 * engine's resolver family (reference: `src/main/java/Repositories/
 * VersionRangeResolver.java:32-86` and its four ecosystem subclasses). The
 * AA edge set of the whole engine — and therefore every downstream graph
 * metric — depends on these functions, so quirks of the reference
 * (catch-all-true equality fallback, integer-overflow -> -1 parsing,
 * regex-over-version AND splitting) are reproduced deliberately. Each quirk
 * is pinned by the golden vectors in `VersionRangeSpec` (ported from the
 * reference's JUnit suites).
 *
 * The reference's two runtime caches (representation cache + containment
 * cache, `VersionRangeResolver.java:200-351`) are purely a performance
 * device and are intentionally absent here: the Spark resolution join
 * deduplicates `(package, rangeSpec)` pairs structurally before calling
 * into this library (see [[graft.resolve.ResolveJob]]).
 */
trait RangeResolver extends Serializable {

  /** Reject specs with illegal markers (reference: per-subclass `isValidVersionReference`). */
  def isValid(spec: String): Boolean

  /** Is the spec a range (vs a fixed version reference)? */
  def isRange(spec: String): Boolean

  /** Normalize a fixed version reference for direct comparison. */
  def normalizeFixed(spec: String): String

  /** Does `version` fall inside the (range-shaped) `spec`? */
  def versionInRange(spec: String, version: String): Boolean

  /** Parse/classify `spec` once and return a containment predicate — the
    * structural stand-in for the reference's representation cache. */
  def rangePredicate(spec: String): String => Boolean =
    v => versionInRange(spec, v)

  /**
   * All versions of `allVersions` addressed by `spec`.
   * Control flow mirrors reference `VersionRangeResolver.findMatchingVersions`:
   * invalid -> empty; range -> per-version containment; fixed -> normalized
   * equality with [[VersionMath.fixedRangeEquals]] fallback.
   */
  def findMatchingVersions(spec: String, allVersions: Iterable[String]): Set[String] = {
    if (!isValid(spec)) Set.empty
    else if (isRange(spec)) {
      val pred = rangePredicate(spec)
      allVersions.iterator.filter(pred).toSet
    } else {
      val fixed = normalizeFixed(spec)
      allVersions.iterator
        .filter(v => fixed == v || fixedRangeEquals(fixed, v))
        .toSet
    }
  }

  /**
   * Component-wise fixed-reference equality with `x` wildcards and numeric
   * coercion (1.0 == 1.0.0). Faithful to reference
   * `VersionRangeResolver.fixedRangeEquals:169-198` including its
   * catch-all-return-TRUE on unexpected errors.
   */
  protected def fixedRangeEquals(range: String, version: String): Boolean =
    VersionMath.fixedRangeEquals(range, version)
}

/** Shared numeric helpers mirroring the reference's string->int coercions. */
object VersionMath {

  /**
   * Parse a version component to Int: inputs longer than 12 chars are
   * truncated to 11 first, all non-digits stripped, parse failures
   * (including empty-after-strip and Int overflow) yield -1.
   * Reference: `VersionRangeResolver.parseNumber:357-367`.
   */
  def parseNumber(raw: String): Int = {
    val s = if (raw.length > 12) raw.substring(0, 11) else raw
    try java.lang.Integer.parseInt(s.replaceAll("\\D", ""))
    catch { case _: NumberFormatException => -1 }
  }

  /** See [[RangeResolver.fixedRangeEquals]]. */
  def fixedRangeEquals(range: String, version: String): Boolean = {
    try {
      if (version.isEmpty) return false
      val rangeParts   = range.split("[.]")
      val versionParts = version.split("[.]")
      // A more specific range than the version never matches.
      if (rangeParts.length > versionParts.length) return false
      var i = 0
      while (i < rangeParts.length) {
        val rp = rangeParts(i)
        val vp = versionParts(i)
        if (rp != "x" && vp != rp && parseNumber(vp) != parseNumber(rp)) return false
        i += 1
      }
      true
    } catch {
      // Reference quirk: any unexpected error during comparison counts as a match.
      case _: Exception => true
    }
  }
}

/** Dispatch by ecosystem name, mirroring the reference's singleton registry
  * (`Utilities/GlobalVersionRangeResolver.java:14-56`, registration
  * `Repositories/RepositoryController.java:85-91`). */
object Resolvers {
  val maven: RangeResolver = new MavenRangeResolver
  val npm: RangeResolver   = new NpmRangeResolver
  val pypi: RangeResolver  = new PyPiRangeResolver
  val nuget: RangeResolver = new NugetRangeResolver

  def forRepo(repo: String): RangeResolver = repo match {
    case "maven" => maven
    case "npm"   => npm
    case "pypi"  => pypi
    case "nuget" => nuget
    case other   => throw new UnsupportedOperationException(s"No version range resolver for repository: $other")
  }

  def findMatchingVersions(repo: String, spec: String, versions: Iterable[String]): Set[String] =
    forRepo(repo).findMatchingVersions(spec, versions)
}
