package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump selected oracle SQL strings to files so a local DuckDB
  * can vet them without a full Verify pass. Usage:
  *   runMain graft.tools.DumpOracle <outDir> [query ...]
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    Files.createDirectories(Paths.get(outDir))
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.oracleSql.keys.toSeq
    names.foreach { n =>
      Files.writeString(Paths.get(s"$outDir/$n.sql"), graft.SparkEntry.oracleSql(n))
    }
  }
}
