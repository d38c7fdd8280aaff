package graft.manifest

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Golden manifest fixtures per parser branch observed in the reference
  * miners (FIXTURES.md §2; SURVEY §5.2-2). */
class ManifestParserSpec extends AnyFunSuite {

  private def file(path: String, content: String) =
    RepoFile("github.com/acme/widget-17", path, "a" * 40, "x", content)

  // ------------------------------------------------------------ package.json

  test("npm registry doc: versions, deps, devDeps, dist-tags.latest, name sanitization") {
    val content =
      """{"name": "my('lib\")", "dist-tags": {"latest": "2.0.0"},
        | "versions": {
        |   "1.0.0": {"dependencies": {"left-pad": "^1.0.0", "lodash": "4.17.x"},
        |             "devDependencies": {"mocha": "~8.0.0"}},
        |   "2.0.0": {"dependencies": {"lodash": ">=4"}}
        | }}""".stripMargin
    val p = ManifestParser.parsePackageJson(file("package.json", content))
    assert(p.eco == "npm")
    assert(p.name == "mylib")                     // "['\")(] stripped (NpmMiner.java:45)
    assert(p.attrs == Map("latest" -> "2.0.0"))
    assert(p.artifacts.map(_.version).toSet == Set("1.0.0", "2.0.0"))
    val a1 = p.artifacts.find(_.version == "1.0.0").get
    assert(a1.deps.map(d => (d.name, d.versionRange)).toSet ==
      Set(("left-pad", "^1.0.0"), ("lodash", "4.17.x"), ("mocha", "~8.0.0")))
    assert(a1.deps.find(_.name == "mocha").get.attrs == Map("type" -> "devDependency"))
    assert(a1.deps.find(_.name == "lodash").get.attrs.isEmpty)
  }

  test("npm plain in-repo manifest: single artifact") {
    val p = ManifestParser.parsePackageJson(file("package.json",
      """{"name": "app", "version": "0.1.0", "dependencies": {"react": "^18.2.0"}}"""))
    assert(p.artifacts.map(_.version) == Seq("0.1.0"))
    assert(p.artifacts.head.deps.map(_.name) == Seq("react"))
  }

  test("npm: missing versions yields package with no artifacts (NpmMiner.java:50)") {
    val p = ManifestParser.parsePackageJson(file("package.json", """{"name": "empty"}"""))
    assert(p.artifacts.map(_.deps).flatten.isEmpty)
  }

  // ----------------------------------------------------------------- pom.xml

  test("pom: coordinates, parent version fallback, property substitution, optional") {
    val content =
      """<project>
        |  <groupId>com.acme</groupId><artifactId>widget</artifactId>
        |  <parent><groupId>com.acme</groupId><version>3.1.4</version></parent>
        |  <dependencies>
        |    <dependency><groupId>junit</groupId><artifactId>junit</artifactId><version>[4.0,5.0)</version></dependency>
        |    <dependency><groupId>${pom.groupId}</groupId><artifactId>core</artifactId><version>${pom.version}</version>
        |      <optional>true</optional></dependency>
        |    <dependency><groupId>org.slf4j</groupId><artifactId>api</artifactId></dependency>
        |  </dependencies>
        |</project>""".stripMargin
    val p = ManifestParser.parsePom(file("pom.xml", content))
    assert(p.eco == "maven")
    assert(p.name == "com.acme:widget")
    assert(p.artifacts.head.version == "3.1.4") // parent fallback (MavenMiner.java:234-236)
    val deps = p.artifacts.head.deps
    assert(deps.map(_.name) == Seq("junit:junit", "com.acme:core", "org.slf4j:api"))
    assert(deps(0).versionRange == "[4.0,5.0)")
    assert(deps(1).versionRange == "3.1.4")     // ${pom.version} substitution (:266-279)
    assert(deps(1).attrs == Map("type" -> "optional"))
    assert(deps(2).versionRange == "")
  }

  test("pom: single dependency object (object-vs-array branch, MavenMiner.java:238-252)") {
    val p = ManifestParser.parsePom(file("pom.xml",
      """<project><groupId>g</groupId><artifactId>a</artifactId><version>1.0</version>
        |<dependencies><dependency><groupId>x</groupId><artifactId>y</artifactId><version>2.0</version></dependency></dependencies>
        |</project>""".stripMargin))
    assert(p.artifacts.head.deps.map(_.name) == Seq("x:y"))
  }

  // --------------------------------------------------------------- pypi

  test("requirement line split semantics (PyPiMiner.java:61-87)") {
    // parenthesised spec: operators are consumed by the split -> empty range
    assert(ManifestParser.parseRequirementLine("charset-normalizer (<4,>=2)") ==
      Seq(RawDep("charset-normalizer", "", Map.empty)))
    // bare inequality: operator stripped, bare version remains
    assert(ManifestParser.parseRequirementLine("idna<4") ==
      Seq(RawDep("idna", "4", Map.empty)))
    // "extra ==" marker: the reference's special-case branch is dead code
    // (the split already consumed every '='), so the observable behaviour is
    // versionRange " extra " — reproduced faithfully.
    assert(ManifestParser.parseRequirementLine("pytest ; extra == 'tests'") ==
      Seq(RawDep("pytest", " extra ", Map.empty)))
    // python_version clause triggers the reference's double-add quirk
    val doubled = ManifestParser.parseRequirementLine("six (python_version<'3.0')")
    assert(doubled.size == 2 && doubled.distinct.size == 1 && doubled.head.name == "six")
  }

  test("pypi registry doc: requires_dist applied to every release") {
    val content =
      """{"info": {"name": "py(lib)", "version": "1.1.0",
        |  "requires_dist": ["requests (>=2.0)", "six"]},
        | "releases": {"1.0.0": [], "1.1.0": []}}""".stripMargin
    val p = ManifestParser.parsePyPiRegistry(file("pypi/pylib.json", content))
    assert(p.name == "pylib")
    assert(p.artifacts.map(_.version).toSet == Set("1.0.0", "1.1.0"))
    assert(p.artifacts.forall(_.deps.map(_.name) == Seq("requests", "six")))
  }

  test("requirements.txt: repo as package, commit as version") {
    val f = file("requirements.txt", "# deps\nrequests>=2.0\n\nflask==1.1.2\n")
    val p = ManifestParser.parseRequirements(f)
    assert(p.eco == "pypi")
    assert(p.artifacts.head.version == f.commit)
    assert(p.artifacts.head.deps.map(_.name) == Seq("requests", "flask"))
  }

  // --------------------------------------------------------------- nuget

  test("nuget catalog doc: artifact attrs + PackageDependency filter (NugetMiner.java:49-90)") {
    val content =
      """{"id": "Graft.Lib", "version": "1.2.3-beta", "authors": "acme", "published": "2020-01-01T00:00:00Z",
        | "dependencyGroups": [
        |   {"dependencies": [{"id": "Newtonsoft.Json", "range": "[12.0.1, )", "@type": "PackageDependency"},
        |                     {"id": "Weird.Thing", "range": "*", "@type": "FrameworkReference"}]},
        |   {"dependencies": [{"id": "System.Memory", "range": "4.5.4", "@type": "PackageDependency"}]}
        | ]}""".stripMargin
    val p = ManifestParser.parseNuget(file("nuget/Graft.Lib.1.2.3-beta.json", content))
    assert(p.name == "Graft.Lib")
    assert(p.artifacts.head.version == "1.2.3-beta")
    assert(p.artifacts.head.attrs("authors") == "acme")
    assert(p.artifacts.head.deps.map(_.name) == Seq("Newtonsoft.Json", "System.Memory"))
  }

  // -------------------------------------------------------------- gradle

  test("build.gradle: short and map notation, test scope tagging") {
    val content =
      """plugins { id 'java' }
        |dependencies {
        |    implementation 'org.apache.commons:commons-lang3:3.12.0'
        |    api("com.google.guava:guava:31.1-jre")
        |    testImplementation 'junit:junit:4.13.2'
        |    implementation group: 'org.slf4j', name: 'slf4j-api', version: '2.0.7'
        |}""".stripMargin
    val p = ManifestParser.parseGradle(file("build.gradle", content))
    assert(p.eco == "maven")
    val deps = p.artifacts.head.deps
    assert(deps.map(d => d.name -> d.versionRange).toSet == Set(
      "org.apache.commons:commons-lang3" -> "3.12.0",
      "com.google.guava:guava" -> "31.1-jre",
      "junit:junit" -> "4.13.2",
      "org.slf4j:slf4j-api" -> "2.0.7"))
    assert(deps.find(_.name == "junit:junit").get.attrs == Map("type" -> "devDependency"))
  }

  // ------------------------------------------------------------ dispatch

  test("dispatch + quarantine") {
    assert(ManifestParser.isManifestPath("a/b/pom.xml"))
    assert(ManifestParser.isManifestPath("package.json"))
    assert(ManifestParser.isManifestPath("nuget/X.1.0.json"))
    assert(!ManifestParser.isManifestPath("src/package.json.bak"))
    assert(!ManifestParser.isManifestPath("README.md"))
    val bad = ManifestParser.parse(file("package.json", """{"name": "trunc"""))
    assert(bad.isLeft)
    assert(bad.left.exists(_.contentSha.length == 64))
  }

  test("versionCompare key matches the reference rule (Model/Artifact.java:63-84)") {
    assert(VersionCompare.key("1.2.3") == "000010000200003")
    assert(VersionCompare.key("1.2") == "000010000200000")
    assert(VersionCompare.key("1.x.3") == "000010000000003")
    assert(VersionCompare.key("1.2.3-beta") == "000010000200003")
    assert(VersionCompare.key("123456.0.0") == "000000000000000")
    assert(VersionCompare.key("") == "000000000000000")
    assert(VersionCompare.key("v2.1.0") == "000020000100000")
  }
}
