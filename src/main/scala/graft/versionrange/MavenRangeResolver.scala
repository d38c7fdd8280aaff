package graft.versionrange

import VersionMath.{parseNumber => pn, fixedRangeEquals => fre}

/**
 * Maven version-range semantics, semantically identical to the reference's
 * Maven resolver (`src/main/java/Repositories/Maven/
 * MavenVersionRangeResolver.java:11-402`). The regexes below are copied
 * verbatim from that file because the *exact* Java regex behaviour (e.g. the
 * unescaped `.` in the version pattern that lets a trailing `]` be absorbed)
 * is part of the observable semantics the golden vectors pin down.
 *
 * Range grammar: fixed `X.X.X`/`[X.X.X]`; one-sided `[,X)` `(X,]` `(,X]`
 * `[X,)` at arities 1-3; `[[a],[b]]` = OR; `[a,b]` = AND (split by
 * regex-replace of each operand, reference `:341-357`).
 */
class MavenRangeResolver extends RangeResolver {

  import MavenRangeResolver._

  override def isValid(spec: String): Boolean =
    !(spec.isEmpty || IllegalMarkers.exists(spec.contains))

  /** A Maven spec is a range iff it contains a comma (reference `:34-36`). */
  override def isRange(spec: String): Boolean = spec.contains(",")

  /** Strip one bracket pair, -SNAPSHOT, `.+` and spaces (reference `:39-55`). */
  override def normalizeFixed(spec: String): String = {
    var s = spec
    try {
      if (s.startsWith("[") && s.endsWith("]"))
        s = s.replaceAll("\\[", "").replaceAll("]", "")
      if (s.contains("-SNAPSHOT")) s = s.replace("-SNAPSHOT", "")
      s = s.replaceAll("[.][+]", "")
    } catch { case _: Exception => () }
    s.replaceAll(" ", "")
  }

  override def versionInRange(spec: String, version: String): Boolean =
    contains(classify(spec), version)

  override def rangePredicate(spec: String): String => Boolean = {
    val repr = classify(spec)
    contains(repr, _)
  }

  /** Normalization applied to range specs before classification (reference `:60-61`). */
  private def normalizeRange(spec: String): String =
    spec.replaceAll(" ", "").split("[-]")(0).split("[@]")(0)
      .replaceAll("(\\*|X)", "x").replaceAll("(\"|\')", "")
      .replaceAll("-SNAPSHOT", "").replaceAll("[.][+]", "")

  /** Drop `(`, `]` and `,` from a one-sided range string (reference `shrinkVersionRange:398-400`;
    * note it deliberately leaves `[` and `)` in place — parseNumber strips them later). */
  private def shrink(s: String): String =
    s.replaceAll("(\\()?", "").replaceAll("(])?", "").replaceAll(",", "")

  /** Classify a normalized range string (reference `buildVersionRangeRepresentation:58-173`).
    * `carried` mirrors the reference's mutable `repr.NormalizedRangeString`:
    * every one-sided branch assigns `shrinkVersionRange(...)` BEFORE its arity
    * switch (`:75,95,115,135`), so an arity>=4 spec that falls through keeps
    * the shrunk string into the final Or/And/Unknown representation. */
  private[versionrange] def classify(spec: String): Repr = {
    val n = normalizeRange(spec)
    var carried = n
    try {
      if (!n.contains(",") && n.matches("(\\[)?" + Pat + "(])?"))
        return Repr(Std, carried)

      def arity(s: String) = s.split("[.]").length

      if (n.matches("(\\[)?" + "," + Pat + "(\\))?")) {
        carried = shrink(n)
        arity(n) match {
          case 1 => return Repr(Lower1, carried)
          case 2 => return Repr(Lower2, carried)
          case 3 => return Repr(Lower3, carried)
          case _ => ()
        }
      }
      if (n.matches("(\\()?" + Pat + "," + "(])?")) {
        carried = shrink(n)
        arity(n) match {
          case 1 => return Repr(Higher1, carried)
          case 2 => return Repr(Higher2, carried)
          case 3 => return Repr(Higher3, carried)
          case _ => ()
        }
      }
      if (n.matches(Prefixes + "?" + "," + Pat + "(])?")) {
        carried = shrink(n)
        arity(n) match {
          case 1 => return Repr(LowerEq1, carried)
          case 2 => return Repr(LowerEq2, carried)
          case 3 => return Repr(LowerEq3, carried)
          case _ => ()
        }
      }
      if (n.matches("(\\[)?" + Pat + "," + Suffixes + "?")) {
        carried = shrink(n)
        arity(n) match {
          case 1 => return Repr(HigherEq1, carried)
          case 2 => return Repr(HigherEq2, carried)
          case 3 => return Repr(HigherEq3, carried)
          case _ => ()
        }
      }
      if (n.matches(Prefixes + "?" + Prefixes + Pat + Suffixes + "," +
                    Prefixes + Pat + Suffixes + Suffixes + "?"))
        return Repr(Or, carried)
      if (n.matches(Prefixes + Pat + "," + Pat + Suffixes))
        return Repr(And, carried)
    } catch { case _: Exception => () }
    Repr(Unknown, carried)
  }

  /** Containment check (reference `isVersionInRange:176-368`). Operator
    * precedence and index-out-of-bounds-to-false behaviour are preserved. */
  private[versionrange] def contains(repr: Repr, rawVersion: String): Boolean = {
    val v = rawVersion.replaceAll(" ", "").replaceAll("-SNAPSHOT", "")
    if (v.contains("$") || v.isEmpty) return false
    val r = repr.norm
    var out = false
    try {
      repr.kind match {
        case Std | Unknown => out = r == v || fre(r, v)

        case Higher1 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 1) out = f(0) == "x" || pn(t(0)) > pn(f(0))
        case Higher2 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 2)
            out = f(1) == "x" || (pn(t(0)) > pn(f(0)) || (pn(t(0)) == pn(f(0)) && pn(t(1)) > pn(f(1))))
        case Higher3 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 3)
            out = f(2) == "x" ||
              (pn(t(0)) > pn(f(0)) ||
               (pn(t(0)) == pn(f(0)) && pn(t(1)) > pn(f(1))) ||
               (pn(t(0)) == pn(f(0)) && pn(t(1)) == pn(f(1)) && pn(t(2)) > pn(f(2))))

        case Lower1 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 1) out = f(0) == "x" || pn(t(0)) < pn(f(0))
        case Lower2 =>
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 2)
            out = f(1) == "x" || (pn(t(0)) < pn(f(0)) || (pn(t(0)) == pn(f(0)) && pn(t(1)) < pn(f(1))))
        case Lower3 =>
          // Reference quirk (`:236-243`): component-wise OR, not lexicographic.
          val f = r.split("[.]"); val t = v.split("[.]")
          if (t.length >= 3)
            out = f(2) == "x" ||
              (pn(t(0)) < pn(f(0)) || pn(t(1)) < pn(f(1)) || pn(t(2)) < pn(f(2)))

        case HigherEq1 => out = eqOr(r, v)(contains(Repr(Higher1, r), _))
        case HigherEq2 => out = eqOr(r, v)(contains(Repr(Higher2, r), _))
        case HigherEq3 => out = eqOr(r, v)(contains(Repr(Higher3, r), _))
        case LowerEq1  => out = eqOr(r, v)(contains(Repr(Lower1, r), _))
        case LowerEq2  => out = eqOr(r, v)(contains(Repr(Lower2, r), _))
        case LowerEq3  => out = eqOr(r, v)(contains(Repr(Lower3, r), _))

        case Or =>
          if (r.split(",").length == 2) {
            val parts = r.replaceAll(Prefixes, "").replaceAll(Suffixes, "").split(",")
            val (a, b) = (parts(0), parts(1))
            if (r != a && r != b && a != b)
              out = contains(Repr(Recursive, a), v) || contains(Repr(Recursive, b), v)
          }

        case And =>
          if (r.split(",").length == 2) {
            val parts = r.replaceFirst(Prefixes, "").replaceFirst(Suffixes, "").split(",")
            // Reference quirk (`:347-350`): operands removed via regex replace,
            // so '.' in a version component matches any char.
            val a = r.replaceAll(parts(1), "")
            val b = r.replaceAll(parts(0), "")
            if (r != a && r != b && a != b)
              out = contains(Repr(Recursive, a), v) && contains(Repr(Recursive, b), v)
          }

        case Recursive => out = contains(classify(r), v)
      }
    } catch { case _: Exception => () }
    out
  }

  /** equals-or-fixedRangeEquals short-circuit used by the *Eq cases (reference `:246-319`). */
  private def eqOr(r: String, v: String)(strict: String => Boolean): Boolean =
    if (r == v || fre(r, v)) true
    else {
      // Note: the strict comparison re-runs inside its own try/catch.
      strict(v)
    }
}

object MavenRangeResolver {
  /** Verbatim reference regexes (`MavenVersionRangeResolver.java:12-15`). */
  private[versionrange] val Pat      = "(v?)((((\\d)+|x).){0,2}((\\d)+|x))(((.)?)((\\w)*))?"
  private[versionrange] val Prefixes = "((\\()|(\\[))"
  private[versionrange] val Suffixes = "((\\))|(]))"

  private[versionrange] val IllegalMarkers = Seq(
    "$", "latest", "npm", "git", "dist", "file:", "link:",
    "sys_platform", "platform_machine", "sys.platform", "https://")

  sealed trait Kind
  case object Unknown   extends Kind
  case object Std       extends Kind
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
  case object Or        extends Kind
  case object And       extends Kind
  case object Recursive extends Kind

  final case class Repr(kind: Kind, norm: String)
}
