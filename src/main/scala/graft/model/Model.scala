package graft.model

/**
 * Core data model: flat typed rows (SURVEY.md §1.5). The reference's
 * object tree (`Model/Package.java`, `Model/Artifact.java`,
 * `Model/Dependency.java`) is normalized into parent/child tables keyed by
 * string ids, because every downstream consumer (resolution join, graph
 * kernels) wants flat edge tables.
 *
 * Identity rules match the reference:
 *  - package id  = repo + ":" + name            (`Model/Package.java:65-67`)
 *  - artifact id = repo + ":" + name + ":" + version (`Model/Artifact.java:24`)
 *  - dependency target package id = repo + ":" + depName (`Model/Artifact.java:92-94`)
 */

/** One row of the input table (BASELINE.json input_hint shape). */
final case class RepoFile(repo: String, path: String, commit: String, lang: String, content: String)

/** A dependency declaration parsed out of a manifest. */
final case class RawDep(name: String, versionRange: String, attrs: Map[String, String])

/** One release of a package. */
final case class RawArtifact(version: String, deps: Seq[RawDep], attrs: Map[String, String])

/** A parsed manifest: a package with its releases. `eco` is the ecosystem /
  * "repository" string ("maven" | "npm" | "pypi" | "nuget"). */
final case class RawPackage(eco: String, name: String, artifacts: Seq[RawArtifact], attrs: Map[String, String])

/** Normalized vertex/edge rows written by MineJob. */
final case class PackageRow(id: String, name: String, repo: String, isPrototype: Boolean, attrs: Map[String, String])
final case class ArtifactRow(id: String, packageId: String, version: String, versionCompare: String, attrs: Map[String, String])
/** Artifact->Package dependency edge; duplicates allowed by design (reference
  * uses CREATE not MERGE for these, `Database/Neo4jDatabaseController.java:129`). */
final case class ApEdge(srcArtifactId: String, dstPackageId: String, repo: String,
                        versionRange: String, resolved: Boolean, attrs: Map[String, String])
/** Package->Package edge, deduplicated (`Neo4jDatabaseController.java:103-117`). */
final case class PpEdge(srcPackageId: String, dstPackageId: String)
/** Artifact->Artifact edge produced by the resolution join. */
final case class AaEdge(srcArtifactId: String, dstArtifactId: String)

/** Quarantined input row (parse failure) — never fails the job (SURVEY §2.7 T3). */
final case class QuarantineRow(repo: String, path: String, commit: String,
                               errorClass: String, message: String, contentSha: String)

object Ids {
  def packageId(eco: String, name: String): String = eco + ":" + name
  def artifactId(eco: String, name: String, version: String): String = eco + ":" + name + ":" + version
}

object VersionCompare {
  /**
   * The reference's sortable version key: three dot components, each
   * zero-padded to 5 digits with non-digits stripped; missing components,
   * `x` components, and components longer than 5 digits become "00000"
   * (`Model/Artifact.java:63-84`).
   */
  def key(version: String): String = {
    val pad = "00000"
    val out = new StringBuilder(15)
    val parts = version.split("[.]")
    var i = 0
    while (i < 3) {
      if (i >= parts.length || parts(i).contains("x")) out.append(pad)
      else {
        val digits = parts(i).replaceAll("\\D+", "")
        if (digits.length > pad.length) out.append(pad)
        else { out.append("0" * (pad.length - digits.length)); out.append(digits) }
      }
      i += 1
    }
    out.toString
  }
}
