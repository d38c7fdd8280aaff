package graft.manifest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model._
import scala.jdk.CollectionConverters._
import scala.util.{Try, Success, Failure}

/**
 * Manifest-content parsers (pure Scala + Jackson/scala-xml; no Spark deps).
 *
 * Reproduces the parse semantics of the reference miners over *content
 * strings* instead of HTTP responses (the graft's input table carries the
 * manifest text in its `content` column):
 *  - package.json registry document -> `Repositories/NPM/NpmMiner.java:40-99`
 *  - pom.xml                        -> `Repositories/Maven/MavenMiner.java:219-285`
 *  - PyPi registry JSON / requirements.txt -> `Repositories/PyPi/PyPiMiner.java:49-121`
 *  - NuGet catalog JSON             -> `Repositories/Nuget/NugetMiner.java:40-90`
 *  - build.gradle (graft extension for the `lang` column; no reference
 *    counterpart — line-based G:A:V extraction, resolved with Maven ranges)
 */
object ManifestParser {

  private val mapper = new ObjectMapper()

  /** Dispatch on the manifest path (SURVEY §2.1 S6 "point scan" replacement). */
  def parse(file: RepoFile): Either[QuarantineRow, RawPackage] = {
    val kind = manifestKind(file.path)
    val attempt: Try[RawPackage] = kind match {
      case Some("package.json")     => Try(parsePackageJson(file))
      case Some("pom.xml")          => Try(parsePom(file))
      case Some("requirements.txt") => Try(parseRequirements(file))
      case Some("pypi.json")        => Try(parsePyPiRegistry(file))
      case Some("nuget.json")       => Try(parseNuget(file))
      case Some("build.gradle")     => Try(parseGradle(file))
      case _                        => Failure(new IllegalArgumentException(s"not a manifest: ${file.path}"))
    }
    attempt match {
      case Success(p) => Right(p)
      case Failure(e) =>
        Left(QuarantineRow(file.repo, file.path, file.commit,
          e.getClass.getSimpleName, Option(e.getMessage).getOrElse("").take(200),
          sha256Hex(file.content)))
    }
  }

  /** Which manifests we recognize; everything else is noise to be filtered out. */
  def manifestKind(path: String): Option[String] = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    if (base == "package.json") Some("package.json")
    else if (base == "pom.xml") Some("pom.xml")
    else if (base == "requirements.txt") Some("requirements.txt")
    else if (base == "build.gradle" || base == "build.gradle.kts") Some("build.gradle")
    else if (base.endsWith(".json") && path.contains("nuget/")) Some("nuget.json")
    else if (base.endsWith(".json") && path.contains("pypi/")) Some("pypi.json")
    else None
  }

  def isManifestPath(path: String): Boolean = manifestKind(path).isDefined

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Reference name sanitization (`NpmMiner.java:45`, `PyPiMiner.java:55`). */
  private def sanitizeName(name: String): String = name.replaceAll("[\"|\'|(|)]", "")

  // ------------------------------------------------------------------- NPM

  /**
   * package.json. Two shapes:
   *  - registry document with a `versions` object (the shape the reference
   *    miner consumes): one artifact per version, `dependencies` +
   *    `devDependencies` (tagged `type=devDependency`), `dist-tags.latest`
   *    becomes the package `latest` attribute;
   *  - plain in-repo manifest `{name, version, dependencies, ...}`: treated
   *    as a registry document with a single version.
   */
  def parsePackageJson(file: RepoFile): RawPackage = {
    val root = mapper.readTree(file.content)
    if (root.isEmpty) throw new IllegalArgumentException("empty package.json")
    val name = sanitizeName(root.get("name").asText())
    val attrs = Option(root.get("dist-tags")).flatMap(dt => Option(dt.get("latest")))
      .map(l => Map("latest" -> l.asText())).getOrElse(Map.empty[String, String])

    def depsOf(versionNode: JsonNode): Seq[RawDep] = {
      def block(field: String, extra: Map[String, String]): Seq[RawDep] =
        Option(versionNode.get(field)).toSeq.flatMap { deps =>
          deps.properties().asScala.map { e =>
            RawDep(e.getKey, e.getValue.asText(), extra)
          }.toSeq
        }
      block("dependencies", Map.empty) ++ block("devDependencies", Map("type" -> "devDependency"))
    }

    val artifacts: Seq[RawArtifact] =
      Option(root.get("versions")) match {
        case Some(versions) =>
          versions.properties().asScala.map { e =>
            RawArtifact(e.getKey, depsOf(e.getValue), Map.empty)
          }.toSeq
        case None =>
          val v = Option(root.get("version")).map(_.asText()).getOrElse("")
          Seq(RawArtifact(v, depsOf(root), Map.empty))
      }
    RawPackage("npm", name, artifacts, attrs)
  }

  // ----------------------------------------------------------------- Maven

  /**
   * pom.xml via scala-xml. The reference fetches maven-metadata.xml plus one
   * POM per version (`MavenMiner.java:59-216`); with content as input, one
   * pom.xml is one artifact. Version falls back to `<parent><version>`
   * (`:234-236`); `${pom.groupId}` / `${pom.version}` / `${pom.currentVersion}`
   * are substituted from the project's own coordinates (`:266-279`);
   * `<optional>true</optional>` tags the dep `type=optional` (`:281-283`).
   */
  def parsePom(file: RepoFile): RawPackage = {
    val project = scala.xml.XML.loadString(file.content)
    def text(n: scala.xml.NodeSeq): Option[String] =
      if (n.isEmpty) None else Some(n.head.text.trim)

    val parent = project \ "parent"
    val groupId = text(project \ "groupId").orElse(text(parent \ "groupId"))
      .getOrElse(throw new IllegalArgumentException("pom without groupId"))
    val artifactId = text(project \ "artifactId")
      .getOrElse(throw new IllegalArgumentException("pom without artifactId"))
    val version = text(project \ "version").orElse(text(parent \ "version")).getOrElse("")
    val packageName = groupId + ":" + artifactId

    val deps = (project \ "dependencies" \ "dependency").map { dep =>
      val dGroupRaw = text(dep \ "groupId").getOrElse("")
      val dGroup = if (dGroupRaw == "${pom.groupId}") groupId else dGroupRaw
      val dArtifact = text(dep \ "artifactId").getOrElse("")
      val dVersionRaw = text(dep \ "version").getOrElse("")
      val dVersion =
        if ((dVersionRaw == "${pom.version}" || dVersionRaw == "${pom.currentVersion}") && version.nonEmpty) version
        else dVersionRaw
      val attrs =
        if (text(dep \ "optional").contains("true")) Map("type" -> "optional")
        else Map.empty[String, String]
      RawDep(dGroup + ":" + dArtifact, dVersion, attrs)
    }

    RawPackage("maven", packageName, Seq(RawArtifact(version, deps, Map.empty)),
      Map("latest" -> version))
  }

  // ------------------------------------------------------------------ PyPi

  /**
   * One `requires_dist`-style requirement line, split exactly the way the
   * reference does (`PyPiMiner.java:61-87`): split on `(;|\(|=|<|>|:)`, first
   * token is the name; the version string is token 1 up to `)`; ` extra == `
   * markers become a `type` attribute; a `python_version` clause triggers the
   * reference's double-add quirk (the dep is appended twice).
   */
  def parseRequirementLine(line: String): Seq[RawDep] = {
    val dep = line.split("(;|\\(|=|<|>|:)")
    var d = RawDep(dep(0).replaceAll(" ", ""), "", Map.empty)
    var doubleAdd = false
    if (dep.length > 1) {
      // NOTE: this branch mirrors `PyPiMiner.java:67-69` but is unreachable —
      // the split above already consumed every '=', so no segment can still
      // contain " extra == ". Kept for structural fidelity; the observable
      // behaviour for extra-markers is versionRange " extra ".
      if (dep(1).contains(" extra == ")) {
        val parts = line.split("=|'")
        d = d.copy(attrs = d.attrs + ("type" -> parts(3)))
      } else {
        val versionString = dep(1).split("[)]")(0)
        if (versionString.contains("python_version")) {
          // Reference quirk (`PyPiMiner.java:72-75,85`): the dep is added once
          // in this branch and once at the loop end -> duplicated edge.
          doubleAdd = true
        } else {
          d = d.copy(versionRange = versionString)
        }
      }
      if (dep.length > 2 && dep(2).contains(" extra == ")) {
        val parts = line.split("=|'")
        d = d.copy(attrs = d.attrs + ("type" -> parts(3)))
      }
    }
    if (doubleAdd) Seq(d, d) else Seq(d)
  }

  /** requirements.txt: the repo itself is the package (graft framing); one
    * artifact whose version is the commit, deps parsed per line with the
    * reference's requires_dist split semantics. */
  def parseRequirements(file: RepoFile): RawPackage = {
    val deps = file.content.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(parseRequirementLine)
      .toSeq
    RawPackage("pypi", sanitizeName(file.repo), Seq(RawArtifact(file.commit, deps, Map.empty)), Map.empty)
  }

  /** PyPi registry JSON: `{info: {name, version, requires_dist}, releases: {...}}`.
    * Faithful to `PyPiMiner.java:49-121`: the dep list is computed once from
    * `info.requires_dist` and attached to every release. */
  def parsePyPiRegistry(file: RepoFile): RawPackage = {
    val root = mapper.readTree(file.content)
    val info = Option(root.get("info")).getOrElse(throw new IllegalArgumentException("pypi json without info"))
    val name = sanitizeName(info.get("name").asText())
    val attrs = Option(info.get("version")).map(v => Map("latest" -> v.asText())).getOrElse(Map.empty[String, String])
    val deps: Seq[RawDep] = Option(info.get("requires_dist")).filter(!_.isNull).toSeq.flatMap { arr =>
      arr.elements().asScala.flatMap(n => parseRequirementLine(n.asText())).toSeq
    }
    val releases = Option(root.get("releases")).filter(!_.isNull)
      .getOrElse(throw new IllegalArgumentException("pypi json without releases"))
    val artifacts = releases.properties().asScala.map { e =>
      RawArtifact(e.getKey, deps, Map.empty)
    }.toSeq
    RawPackage("pypi", name, artifacts, attrs)
  }

  // ----------------------------------------------------------------- NuGet

  /** NuGet catalog JSON: one artifact per document; dependencyGroups ->
    * PackageDependency edges (`NugetMiner.java:49-90`); `authors` and
    * `published` kept as artifact attributes. */
  def parseNuget(file: RepoFile): RawPackage = {
    val root = mapper.readTree(file.content)
    val name = root.get("id").asText()
    val version = root.get("version").asText()
    val attrs = Map(
      "authors" -> Option(root.get("authors")).map(_.asText()).getOrElse(""),
      "published" -> Option(root.get("published")).map(_.asText()).getOrElse(""))
    val deps: Seq[RawDep] = Option(root.get("dependencyGroups")).toSeq.flatMap { groups =>
      groups.elements().asScala.flatMap { group =>
        Option(group.get("dependencies")).toSeq.flatMap { ds =>
          ds.elements().asScala.flatMap { d =>
            if (d.get("@type").asText() == "PackageDependency")
              Some(RawDep(d.get("id").asText(), d.get("range").asText(), Map.empty))
            else None // unknown dependency types are skipped (reference prints + skips)
          }.toSeq
        }
      }.toSeq
    }
    RawPackage("nuget", name, Seq(RawArtifact(version, deps, attrs)), Map.empty)
  }

  // ---------------------------------------------------------------- Gradle

  private val GradleShort = ("""(?m)^\s*(implementation|api|compile|testImplementation|""" +
    """runtimeOnly|compileOnly|testCompile)\s*[\s(]\s*['"]([^'":\s]+):([^'":\s]+):([^'"\s]+)['"]""").r
  private val GradleMap = ("""(?m)^\s*(implementation|api|compile|testImplementation|""" +
    """runtimeOnly|compileOnly|testCompile)\s*[\s(]?\s*group\s*:\s*['"]([^'"]+)['"]\s*,\s*""" +
    """name\s*:\s*['"]([^'"]+)['"]\s*,\s*version\s*:\s*['"]([^'"]+)['"]""").r

  /** build.gradle: `implementation 'g:a:v'` and `group:/name:/version:` map
    * notation. Ecosystem "maven" (same id space + range grammar as poms).
    * Test-scoped configurations are tagged like NPM devDependencies. */
  def parseGradle(file: RepoFile): RawPackage = {
    val shortDeps = GradleShort.findAllMatchIn(file.content).map { m =>
      val attrs = if (m.group(1).startsWith("test")) Map("type" -> "devDependency") else Map.empty[String, String]
      RawDep(m.group(2) + ":" + m.group(3), m.group(4), attrs)
    }.toSeq
    val mapDeps = GradleMap.findAllMatchIn(file.content).map { m =>
      val attrs = if (m.group(1).startsWith("test")) Map("type" -> "devDependency") else Map.empty[String, String]
      RawDep(m.group(2) + ":" + m.group(3), m.group(4), attrs)
    }.toSeq
    RawPackage("maven", sanitizeName(file.repo), Seq(RawArtifact(file.commit, shortDeps ++ mapDeps, Map.empty)), Map.empty)
  }
}
