package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-13 contracts. Starts with the registry-count drift guard
  * (VERDICT r12 next #8: the SURVEY §2.3 round table claimed 243 while
  * the registry held 245 — the same defect class as VERDICT r11 #5, and
  * it recurs because nothing asserts it): the LAST "Registry N" claim in
  * SURVEY.md and the README's "driver contract: N queries" line must
  * both equal `SparkEntry.registry.size`, and the README's oracle count
  * must equal `SparkEntry.oracleSql.size`. The build now fails when the
  * docs drift from the code.
  */
class Round13Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-round13-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def readFile(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  test("SURVEY/README registry counts match SparkEntry (drift guard)") {
    val n = SparkEntry.registry.size
    val nOracled = SparkEntry.oracleSql.size

    // SURVEY §2.3: the round table's LAST "Registry N" claim is the
    // current registry size by construction of the table
    val surveyClaims = raw"Registry (\d+)".r
      .findAllMatchIn(readFile("SURVEY.md")).map(_.group(1).toInt).toSeq
    assert(surveyClaims.nonEmpty, "SURVEY.md lost its Registry claims")
    assert(surveyClaims.last === n,
      s"SURVEY.md claims Registry ${surveyClaims.last}, code has $n — " +
        "update the §2.3 round table")

    // README: "driver contract: N queries, M with DuckDB oracles"
    val readme = readFile("README.md")
    val rm = raw"driver contract: (\d+) queries, (\d+) with DuckDB oracles".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README.md lost its driver-contract line"))
    assert(rm.group(1).toInt === n,
      s"README claims ${rm.group(1)} queries, code has $n")
    assert(rm.group(2).toInt === nOracled,
      s"README claims ${rm.group(2)} oracled, code has $nOracled")
  }
}
