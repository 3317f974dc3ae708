package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: dump EVERY SparkEntry.oracleSql entry as JSON without
  * running any query — feeds the type-gate sweep in
  * tools/compare_oracle.py (DESCRIBE each oracle, fail on
  * HUGEINT/DECIMAL output columns) so the x01/t29/l15 DuckDB
  * integer-promotion class is catchable in seconds, not a full
  * verify run. Usage: OracleSqlDump <outfile.json>. */
object OracleSqlDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql_all.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle SQLs to $out")
  }
}
