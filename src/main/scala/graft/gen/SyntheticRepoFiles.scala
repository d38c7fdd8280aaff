package graft.gen

import graft.model.RepoFile
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic synthetic generator for the input table
 * `(repo, path, commit, lang, content)` (BASELINE.json `input_hint`).
 *
 * Every row is a pure function of (seed, ecosystem, packageIndex,
 * versionIndex) via splitmix64 mixing, so the output is identical for any
 * partitioning / parallelism level — a precondition for the two-cluster-size
 * scaling evidence and for resumability checks.
 *
 * Shape knobs (SURVEY §7.1-3, FIXTURES.md §1):
 *  - per-ecosystem package universes (npm / pypi registry docs carry all
 *    versions in one row; maven / nuget emit one row per (package, version) —
 *    i.e. one commit per release of the same repo);
 *  - Zipf-skewed dependency targets so junit/lodash-style hub packages exist;
 *  - a slice of dangling targets (-> prototype packages);
 *  - a slice of malformed manifests (-> quarantine path);
 *  - non-manifest noise files the scan must filter out.
 */
object SyntheticRepoFiles {

  val Ecos: Seq[String] = Seq("npm", "pypi", "maven", "nuget")

  final case class Config(packagesPerEco: Int, seed: Long = 42L,
                          maxVersions: Int = 8, maxDeps: Int = 6,
                          danglingShare: Double = 0.05, malformedShare: Double = 0.02,
                          noiseFiles: Int = 0) {
    def noiseCount: Int = if (noiseFiles > 0) noiseFiles else packagesPerEco / 2
  }

  /** sf-scaled config: sf 0.01 -> 120 pkgs/eco, sf 0.1 -> 1200 pkgs/eco. */
  def configForSf(sf: Double): Config = Config(packagesPerEco = math.max(40, (sf * 12000).toInt))

  def sfOfDir(dir: String): Double = {
    val m = "sf([0-9.]+)".r.findFirstMatchIn(dir)
    m.map(_.group(1).toDouble).getOrElse(0.01)
  }

  // --------------------------------------------------------- deterministic rng

  /** splitmix64 mix — stable, partition-independent randomness. */
  def mix(parts: Long*): Long = {
    var z = 0x9E3779B97F4A7C15L
    for (p <- parts) {
      z ^= p + 0x9E3779B97F4A7C15L + (z << 6) + (z >>> 2)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
    }
    z
  }
  private def u01(h: Long): Double = ((h >>> 11).toDouble / (1L << 53).toDouble)
  private def pick(h: Long, n: Int): Int = (Math.floorMod(h, n.toLong)).toInt

  /** Zipf-ish target index: cubing pushes mass toward low indexes (hubs). */
  def zipfTarget(h: Long, n: Int): Int = {
    val u = u01(h)
    math.min(n - 1, (u * u * u * n).toInt)
  }

  def hexCommit(h1: Long, h2: Long): String = f"$h1%016x$h2%016x$h1%08x".take(40)

  // --------------------------------------------------------------- name model

  def pkgName(eco: String, i: Int): String = eco match {
    case "npm"   => s"lib-$i"
    case "pypi"  => s"py-lib-$i"
    case "maven" => s"com.graft.g${i % 97}:lib-$i"
    case "nuget" => s"Graft.Lib$i"
    case _       => s"pkg-$i"
  }

  def versionsOf(cfg: Config, eco: String, i: Int): Seq[String] = {
    val n = 1 + pick(mix(cfg.seed, eco.hashCode, i, 1), cfg.maxVersions)
    (0 until n).map { v =>
      val h = mix(cfg.seed, eco.hashCode, i, 2, v)
      s"${v / 4 + 1}.${v % 4}.${pick(h, 4)}"
    }
  }

  /** Dependency list for one (package, version): Zipf-skewed targets within
    * the same ecosystem, range spec drawn from the ecosystem grammar. */
  def depsOf(cfg: Config, eco: String, i: Int, version: String): Seq[(String, String)] = {
    val nDeps = pick(mix(cfg.seed, eco.hashCode, i, 3, version.hashCode), cfg.maxDeps + 1)
    (0 until nDeps).map { d =>
      val h = mix(cfg.seed, eco.hashCode, i, 4, version.hashCode, d)
      val dangling = u01(mix(h, 7)) < cfg.danglingShare
      val target =
        if (dangling) s"ghost-${pick(h, 50)}"
        else {
          var t = zipfTarget(h, cfg.packagesPerEco)
          if (t == i) t = (t + 1) % cfg.packagesPerEco
          pkgName(eco, t)
        }
      (if (dangling && eco == "maven") s"com.graft.ghost:$target" else target,
        rangeSpec(eco, h))
    }
  }

  /** Range-spec mix per ecosystem (grammar tables, SURVEY §2.5). */
  def rangeSpec(eco: String, h: Long): String = {
    def v3 = s"${1 + pick(mix(h, 1), 2)}.${pick(mix(h, 2), 4)}.${pick(mix(h, 3), 4)}"
    def v3b = s"${1 + pick(mix(h, 4), 2)}.${pick(mix(h, 5), 4)}.${pick(mix(h, 6), 4)}"
    def v2 = s"${1 + pick(mix(h, 1), 2)}.${pick(mix(h, 2), 4)}"
    val roll = pick(mix(h, 99), 100)
    eco match {
      case "npm" =>
        if (roll < 25) s"^$v3" else if (roll < 40) s"~$v3"
        else if (roll < 50) s">=$v2" else if (roll < 58) s"<${1 + pick(mix(h, 1), 3)}"
        else if (roll < 66) s"$v2.x" else if (roll < 70) "*"
        else if (roll < 78) v3
        else if (roll < 84) s">=$v3,<$v3b"
        else if (roll < 90) s"<=$v3 || >$v3b"
        else if (roll < 95) "latest"           // invalid -> never resolves
        else "${version}"                      // invalid -> never resolves
      case "pypi" =>
        if (roll < 25) s"==$v3" else if (roll < 45) s">=$v3"
        else if (roll < 60) s"~=$v2" else if (roll < 72) s">=$v3,!=$v3b"
        else if (roll < 80) s"<${1 + pick(mix(h, 1), 3)}"
        else if (roll < 90) "" else s">$v2"
      case "maven" =>
        if (roll < 25) v3 else if (roll < 40) s"[$v3]"
        else if (roll < 55) s"[$v3,$v3b)" else if (roll < 65) s"(,$v3]"
        else if (roll < 75) s"[$v3,)" else if (roll < 85) s"[[$v3],[$v3b]]"
        else if (roll < 95) s"[$v2,$v3b]" else "${project.version}" // invalid
      case _ => // nuget
        if (roll < 25) s"[$v3,$v3b)" else if (roll < 45) v3
        else if (roll < 60) s"[$v3]" else if (roll < 70) s"(,$v3]"
        else if (roll < 85) s"${1 + pick(mix(h, 1), 2)}.*" else "*"
    }
  }

  // ----------------------------------------------------------- content builders

  private def jsonEscape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  def npmRegistryDoc(cfg: Config, i: Int): String = {
    val name = pkgName("npm", i)
    val versions = versionsOf(cfg, "npm", i)
    val vBlocks = versions.map { v =>
      val deps = depsOf(cfg, "npm", i, v)
      val (dev, main) = deps.zipWithIndex.partition { case (_, d) => pick(mix(cfg.seed, i, v.hashCode, d, 11), 5) == 0 }
      // A real package.json dependency map cannot carry duplicate keys, so a
      // repeated target keeps only its LAST drawn range (the same value
      // Jackson's duplicate-field handling would settle on): the emitted
      // JSON parses identically under ANY strict JSON engine.
      def block(ds: Seq[((String, String), Int)]) = {
        val lastIdx = ds.map { case ((n, _), i2) => n -> i2 }.toMap
        ds.filter { case ((n, _), i2) => lastIdx(n) == i2 }
          .map { case ((n, r), _) => s""""${jsonEscape(n)}": "${jsonEscape(r)}"""" }.mkString(", ")
      }
      s""""$v": {"dependencies": {${block(main)}}, "devDependencies": {${block(dev)}}}"""
    }.mkString(", ")
    s"""{"name": "$name", "dist-tags": {"latest": "${versions.last}"}, "versions": {$vBlocks}}"""
  }

  def pypiRegistryDoc(cfg: Config, i: Int): String = {
    val name = pkgName("pypi", i)
    val versions = versionsOf(cfg, "pypi", i)
    // requires_dist is package-level in the reference; derive it from the last version.
    val deps = depsOf(cfg, "pypi", i, versions.last)
    val reqs = deps.map { case (n, r) =>
      val h = mix(cfg.seed, 5, i, n.hashCode)
      pick(h, 4) match {
        case 0 if r.nonEmpty => s""""$n ($r)""""
        case 1               => s""""$n ; extra == 'tests'""""
        case _               => s""""$n$r""""
      }
    }.mkString(", ")
    val releases = versions.map(v => s""""$v": [{"filename": "$name-$v.tar.gz"}]""").mkString(", ")
    s"""{"info": {"name": "$name", "version": "${versions.last}", "requires_dist": [$reqs]}, "releases": {$releases}}"""
  }

  def pomDoc(cfg: Config, i: Int, version: String): String = {
    val name = pkgName("maven", i)
    val Array(groupId, artifactId) = name.split(":", 2)
    val deps = depsOf(cfg, "maven", i, version)
    val depXml = deps.zipWithIndex.map { case ((n, r), d) =>
      val Array(dg, da) = n.split(":", 2)
      val h = mix(cfg.seed, 6, i, version.hashCode, d)
      val versionTag = pick(h, 10) match {
        case 0 => "<version>${pom.version}</version>"
        case _ if r.isEmpty => ""
        case _ => s"<version>$r</version>"
      }
      val opt = if (pick(h, 12) == 0) "<optional>true</optional>" else ""
      s"    <dependency><groupId>$dg</groupId><artifactId>$da</artifactId>$versionTag$opt</dependency>"
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
<project>
  <groupId>$groupId</groupId>
  <artifactId>$artifactId</artifactId>
  <version>$version</version>
  <dependencies>
$depXml
  </dependencies>
</project>"""
  }

  def nugetDoc(cfg: Config, i: Int, version: String): String = {
    val name = pkgName("nuget", i)
    val deps = depsOf(cfg, "nuget", i, version)
    val depJson = deps.map { case (n, r) =>
      s"""{"id": "$n", "range": "${jsonEscape(r)}", "@type": "PackageDependency"}"""
    }.mkString(", ")
    s"""{"id": "$name", "version": "$version", "authors": "graft-gen", "published": "2024-01-0${1 + pick(mix(cfg.seed, i, version.hashCode), 9)}T00:00:00Z", "dependencyGroups": [{"dependencies": [$depJson]}]}"""
  }

  // ------------------------------------------------------------------ rows

  def isMalformed(cfg: Config, eco: String, i: Int): Boolean =
    u01(mix(cfg.seed, eco.hashCode, i, 13)) < cfg.malformedShare

  private def truncate(content: String): String = content.substring(0, content.length / 2)

  def rowsForPackage(cfg: Config, eco: String, i: Int): Seq[RepoFile] = {
    val repo = s"github.com/$eco/${pkgName(eco, i).replace(':', '_')}"
    val bad = isMalformed(cfg, eco, i)
    eco match {
      case "npm" =>
        val c = npmRegistryDoc(cfg, i)
        Seq(RepoFile(repo, "package.json", hexCommit(mix(cfg.seed, 1, i), mix(cfg.seed, 2, i)),
          "javascript", if (bad) truncate(c) else c))
      case "pypi" =>
        val c = pypiRegistryDoc(cfg, i)
        Seq(RepoFile(repo, s"pypi/${pkgName(eco, i)}.json", hexCommit(mix(cfg.seed, 3, i), mix(cfg.seed, 4, i)),
          "python", if (bad) truncate(c) else c))
      case "maven" =>
        versionsOf(cfg, eco, i).zipWithIndex.map { case (v, vi) =>
          val c = pomDoc(cfg, i, v)
          RepoFile(repo, "pom.xml", hexCommit(mix(cfg.seed, 5, i, vi), mix(cfg.seed, 6, i, vi)),
            "java", if (bad && vi == 0) truncate(c) else c)
        }
      case _ =>
        versionsOf(cfg, eco, i).zipWithIndex.map { case (v, vi) =>
          val c = nugetDoc(cfg, i, v)
          RepoFile(repo, s"nuget/${pkgName(eco, i)}.$v.json", hexCommit(mix(cfg.seed, 7, i, vi), mix(cfg.seed, 8, i, vi)),
            "csharp", if (bad && vi == 0) truncate(c) else c)
        }
    }
  }

  def noiseRow(cfg: Config, i: Int): RepoFile = {
    val paths = Seq("README.md", "src/main.c", "Makefile", ".gitignore", "docs/index.html")
    RepoFile(s"github.com/noise/repo-$i", paths(pick(mix(cfg.seed, 9, i), paths.size)),
      hexCommit(mix(cfg.seed, 10, i), mix(cfg.seed, 11, i)), "other",
      s"noise content $i — not a manifest")
  }

  /** The distributed generator: a partition-independent pure map over an index
    * range; no driver-side materialization. */
  def generate(spark: SparkSession, cfg: Config): Dataset[RepoFile] = {
    import spark.implicits._
    val nEcos = Ecos.size
    val pkgRows = spark.range(0, cfg.packagesPerEco.toLong * nEcos)
      .flatMap { idx =>
        val eco = Ecos((idx % nEcos).toInt)
        val i = (idx / nEcos).toInt
        rowsForPackage(cfg, eco, i)
      }
    val noise = spark.range(0, cfg.noiseCount.toLong).map(i => noiseRow(cfg, i.toInt))
    pkgRows.union(noise)
  }

  /** Driver-free local generation for tests and oracles. */
  def generateLocal(cfg: Config): Seq[RepoFile] = {
    val pkgs = for {
      idx <- 0L until cfg.packagesPerEco.toLong * Ecos.size
      row <- rowsForPackage(cfg, Ecos((idx % Ecos.size).toInt), (idx / Ecos.size).toInt)
    } yield row
    pkgs ++ (0 until cfg.noiseCount).map(i => noiseRow(cfg, i))
  }
}
