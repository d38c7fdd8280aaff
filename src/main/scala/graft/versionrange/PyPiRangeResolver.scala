package graft.versionrange

import VersionMath.{parseNumber => pn, fixedRangeEquals => fre}

/**
 * PyPi (PEP-440-ish) range semantics, matching the reference's PyPi resolver
 * (`src/main/java/Repositories/PyPi/PyPiVersionRangeResolver.java:11-487`).
 *
 * Like NPM plus: `==`/`===` fixed references, empty spec addresses ALL
 * versions (reference `:283-287`), `~=` compatible-release, `!=` with
 * short-version expansion (`!=0.2` -> excludes exactly `0.2.0`, reference
 * `:224-230,476-486`), comma-AND and `||`-OR with two operands max (an
 * acknowledged reference limitation, its test suite `:94-95`).
 */
class PyPiRangeResolver extends RangeResolver {

  import PyPiRangeResolver._

  /** Unlike NPM, the empty spec is *valid* here (it means ALL). */
  override def isValid(spec: String): Boolean =
    !MavenRangeResolver.IllegalMarkers.exists(spec.contains)

  override def isRange(spec: String): Boolean = !spec.matches(Pat)

  override def normalizeFixed(spec: String): String = {
    val s = if (spec.contains("workspace:")) spec.split("[workspace:]")(1) else spec
    s.replaceAll(" ", "").split("[-]")(0).split("[@]")(0)
      .replaceAll("(\\*|X)", "x").replaceAll("(\"|\')", "").replaceAll(" ", "")
  }

  override def versionInRange(spec: String, version: String): Boolean =
    contains(classify(spec), version)

  override def rangePredicate(spec: String): String => Boolean = {
    val repr = classify(spec)
    contains(repr, _)
  }

  /** Classify (reference `buildVersionRangeRepresentation:276-441`). Note the
    * normalization chain here does NOT strip spaces before the `-` split —
    * spaces are removed only at the end, mirroring reference `:279-280`. */
  private[versionrange] def classify(spec: String): Repr = {
    val n = spec.split("[-]")(0).split("[@]")(0)
      .replaceAll("(\\*|X)", "x").replaceAll("(\"|\')", "").replaceAll(" ", "")
    if (n.isEmpty) return Repr(All, n)
    // `carried` mirrors the reference's mutable NormalizedRangeString: the ^
    // branch strips carets/commas before its arity switch (`:303`), and an
    // arity>=4 fall-through keeps the stripped string into Not/Or/And/Unknown.
    var carried = n
    val found: Option[Repr] =
      try {
        def byArity(k1: Kind, k2: Kind, k3: Kind): Option[Repr] =
          n.split("[.]").length match {
            case 1 => Some(Repr(k1, carried)); case 2 => Some(Repr(k2, carried))
            case 3 => Some(Repr(k3, carried)); case _ => None
          }
        def when(cond: Boolean)(r: => Option[Repr]): Option[Repr] = if (cond) r else None

        when(n.matches("((==)|(===))?" + Pat))(Some(Repr(Std, carried)))
          .orElse(when(n.matches("\\^" + Pat)) {
            carried = n.replaceAll("(,)?", "").replaceAll("\\^", "")
            byArity(Dash1, Dash2, Dash3)
          })
          .orElse(when(n.matches(">" + Pat))(byArity(Higher1, Higher2, Higher3)))
          .orElse(when(n.matches(">=" + Pat))(byArity(HigherEq1, HigherEq2, HigherEq3)))
          .orElse(when(n.matches("<" + Pat))(byArity(Lower1, Lower2, Lower3)))
          .orElse(when(n.matches("<=" + Pat))(byArity(LowerEq1, LowerEq2, LowerEq3)))
          .orElse(when(n.matches("~(=)?" + Pat))(byArity(Tilde1, Tilde2, Tilde3)))
          .orElse(when(n.matches("!(\\=)?" + Pat) || n.matches("!\\=(\\d)+"))(Some(Repr(Not, carried))))
          .orElse(when(n.matches(Prefixes + "?" + Pat + OrOp + Prefixes + "?" + Pat))(Some(Repr(Or, carried))))
          .orElse(when(n.matches(Prefixes + "?" + Pat + "(,)" + Prefixes + "?" + Pat))(Some(Repr(And, carried))))
      } catch { case _: Exception => None }
    found.getOrElse(Repr(Unknown, carried))
  }

  /** `!=0.2` -> `0.2.0` style expansion (reference `extendVersionRange:476-486`). */
  private def extend(range: String): String = {
    val v = range.replaceAll("!=", "")
    v.split("[.]").length match {
      case 0 => ""
      case 1 => v + ".0.0"
      case 2 => v + ".0"
      case _ => v
    }
  }

  /** Containment (reference `isVersionInRange:44-273`). */
  private[versionrange] def contains(repr: Repr, rawVersion: String): Boolean = {
    if (repr.kind == All) return true
    val v = rawVersion.replaceAll(" ", "")
    if (v.contains("$") || v.isEmpty) return false
    val r = repr.norm
    var out = false
    try {
      repr.kind match {
        case All => out = true // unreachable; handled above
        case Std | Unknown => out = r == v || fre(r, v)

        case Dash1 | HigherEq1 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 1) out = f(0) == "x" || pn(t(0)) >= pn(f(0))
        case Dash2 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 2)
            out = f(1) == "x" || (pn(t(0)) == pn(f(0)) && pn(t(1)) >= pn(f(1)))
        case Dash3 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 3)
            out = f(2) == "x" ||
              (pn(t(0)) == pn(f(0)) && pn(t(1)) > pn(f(1))) ||
              (pn(t(0)) == pn(f(0)) && pn(t(1)) >= pn(f(1)) && pn(t(2)) >= pn(f(2)))

        case HigherEq2 => out = if (fre(r, v)) true else contains(Repr(Higher2, r), v)
        case HigherEq3 => out = if (fre(r, v)) true else contains(Repr(Higher3, r), v)
        case LowerEq1  => out = if (fre(r, v)) true else contains(Repr(Lower1, r), v)
        case LowerEq2  => out = if (fre(r, v)) true else contains(Repr(Lower2, r), v)
        case LowerEq3  => out = if (fre(r, v)) true else contains(Repr(Lower3, r), v)

        case Higher1 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 1) out = f(0) == "x" || pn(t(0)) > pn(f(0))
        case Higher2 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 2)
            out = f(1) == "x" ||
              (pn(t(0)) > pn(f(0)) || (pn(t(0)) >= pn(f(0)) && pn(t(1)) > pn(f(1))))
        case Higher3 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 3)
            out = f(2) == "x" ||
              (pn(t(0)) > pn(f(0)) ||
               (pn(t(0)) >= pn(f(0)) && pn(t(1)) > pn(f(1))) ||
               (pn(t(0)) >= pn(f(0)) && pn(t(1)) >= pn(f(1)) && pn(t(2)) > pn(f(2))))

        case Lower1 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 1) out = f(0) == "x" || pn(t(0)) < pn(f(0))
        case Lower2 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 2)
            out = f(1) == "x" ||
              (pn(t(0)) < pn(f(0)) || (pn(t(0)) == pn(f(0)) && pn(t(1)) < pn(f(1))))
        case Lower3 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 3)
            out = f(2) == "x" ||
              (pn(t(0)) < pn(f(0)) ||
               (pn(t(0)) <= pn(f(0)) && pn(t(1)) < pn(f(1))) ||
               (pn(t(0)) <= pn(f(0)) && pn(t(1)) <= pn(f(1)) && pn(t(2)) < pn(f(2))))

        case Tilde1 =>
          if (v.split("[.]").length >= 1) out = true
        case Tilde2 =>
          // Reference quirk: guard is length>=1 here (vs NPM's >=2), `:204-212`.
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 1)
            out = f(1) == "x" ||
              (pn(t(0)) == pn(f(0)) && (pn(t(1)) >= pn(f(1)) || f(2) == "x"))
        case Tilde3 =>
          // Guard is length>=2 here (vs NPM's >=3), `:213-222`.
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 2)
            out = pn(t(0)) == pn(f(0)) &&
              (pn(t(1)) == pn(f(1)) || f(2) == "x") &&
              (pn(t(2)) >= pn(f(2)) || f(3) == "x")

        case Not =>
          val expanded = if (r.split("[.]").length < 3) extend(r) else r
          out = !(expanded == v || fre(expanded, v))

        case Or =>
          val parts = r.split(OrOp)
          out = contains(Repr(Recursive, parts(0)), v) || contains(Repr(Recursive, parts(1)), v)

        case And =>
          val parts = r.split(",")
          out = contains(Repr(Recursive, parts(0)), v) && contains(Repr(Recursive, parts(1)), v)

        case Recursive =>
          val rr = if (r.contains("workspace:")) r.split("[workspace:]")(1) else r
          out = contains(classify(rr), v)
      }
    } catch { case _: Exception => () }
    out
  }
}

object PyPiRangeResolver {
  /** Verbatim reference regexes (`PyPiVersionRangeResolver.java:30,289-292`). */
  private[versionrange] val Pat      = "(v?)((((\\d)+|x).){0,2}((\\d)+|x))(((.)?)((\\w)*))?"
  private[versionrange] val Prefixes = "(\\^|~|>|(>=)|<|(<=)|==|===|~=|(!=))"
  private[versionrange] val OrOp     = "(\\|\\|)"

  sealed trait Kind
  case object Unknown   extends Kind
  case object Std       extends Kind
  case object Recursive extends Kind
  case object And       extends Kind
  case object Or        extends Kind
  case object Dash1     extends Kind
  case object Dash2     extends Kind
  case object Dash3     extends Kind
  case object Higher1   extends Kind
  case object Higher2   extends Kind
  case object Higher3   extends Kind
  case object HigherEq1 extends Kind
  case object HigherEq2 extends Kind
  case object HigherEq3 extends Kind
  case object Lower1    extends Kind
  case object Lower2    extends Kind
  case object Lower3    extends Kind
  case object LowerEq1  extends Kind
  case object LowerEq2  extends Kind
  case object LowerEq3  extends Kind
  case object Tilde1    extends Kind
  case object Tilde2    extends Kind
  case object Tilde3    extends Kind
  case object Not       extends Kind
  case object All       extends Kind

  final case class Repr(kind: Kind, norm: String)
}
