package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Foreign SQL-dump import (SURVEY §repo-map's one scoped-out surface; the
 * reference loads the TP53/P53_Database .sql SQL Server dumps and
 * Targetome/init-targetome.sql by replaying them through a database): parse
 * `CREATE TABLE` + `INSERT INTO ... VALUES` statements straight into
 * DataFrames, no database needed.
 *
 * Scale contract: a DDL dump is a FIXTURE artifact — bounded by what some
 * upstream tool exported, not by the lake — so the statement scan is
 * driver-side (guarded by `maxBytes`, default 256 MB) and only the parsed
 * ROWS distribute. Statement splitting and value tokenizing are
 * quote-aware (`''` escapes, `--` and block comments skipped), so comments
 * and semicolons inside string values never split a statement.
 */
object SqlDump {

  final case class TableDef(name: String, schema: StructType)

  /** Quote-aware statement split: honors '...' strings (with '' escapes),
    * line comments, and block comments. */
  private[io] def splitStatements(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    val n = sql.length
    var inStr = false
    while (i < n) {
      val c = sql.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\'') {
          if (i + 1 < n && sql.charAt(i + 1) == '\'') { cur.append('\''); i += 1 }
          else inStr = false
        }
        i += 1
      } else if (c == '\'') { inStr = true; cur.append(c); i += 1 }
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c == ';') { out += cur.toString.trim; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  /** SQL type name → Spark type (the dump dialects the reference carries:
    * SQL Server + MySQL-ish). Unknown types fall back to string — an
    * import must never drop a column it can't classify. */
  private[io] def sqlType(t: String): DataType = {
    val base = t.toUpperCase.takeWhile(c => c.isLetter || c == '_')
    base match {
      case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" => LongType
      case "FLOAT" | "DOUBLE" | "REAL" | "DECIMAL" | "NUMERIC" => DoubleType
      case "BIT" | "BOOLEAN" | "BOOL" => BooleanType
      case _ => StringType // VARCHAR/NVARCHAR/CHAR/TEXT/DATE/DATETIME/...
    }
  }

  private val CreateRe =
    """(?is)CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[\[`"]?([\w.]+)[\]`"]?\s*\((.*)\)\s*""".r
  private val InsertRe =
    """(?is)INSERT\s+INTO\s+[\[`"]?([\w.]+)[\]`"]?\s*(?:\([^)]*\)\s*)?VALUES\s*(.*)""".r

  /** Column definitions from a CREATE TABLE body, skipping constraint
    * clauses (PRIMARY KEY / FOREIGN KEY / UNIQUE / CONSTRAINT / KEY). */
  private[io] def parseCreate(stmt: String): Option[TableDef] = stmt match {
    case CreateRe(name, body) =>
      val cols = splitTopLevel(body, ',').map(_.trim).filter(_.nonEmpty)
        .filterNot { c =>
          val u = c.toUpperCase
          u.startsWith("PRIMARY") || u.startsWith("FOREIGN") ||
            u.startsWith("UNIQUE") || u.startsWith("CONSTRAINT") ||
            u.startsWith("KEY") || u.startsWith("INDEX") || u.startsWith("CHECK")
        }
        .map { c =>
          val parts = c.split("\\s+", 2)
          val colName = parts(0).stripPrefix("[").stripSuffix("]")
            .stripPrefix("`").stripSuffix("`").stripPrefix("\"").stripSuffix("\"")
          StructField(colName, sqlType(parts.lift(1).getOrElse("TEXT")),
            nullable = true)
        }
      Some(TableDef(name.toLowerCase, StructType(cols)))
    case _ => None
  }

  /** Split on `sep` only at paren depth 0, outside strings. */
  private[io] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { cur.append('\''); i += 1 }
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case other => cur.append(other)
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** One VALUES tuple body "a, 'b', NULL" → typed cell values. */
  private[io] def parseTuple(body: String, schema: StructType): Row = {
    val cells = splitTopLevel(body, ',').map(_.trim)
    require(cells.length == schema.length,
      s"tuple arity ${cells.length} != schema arity ${schema.length} in ($body)")
    Row.fromSeq(cells.zip(schema.fields).map { case (raw, f) =>
      if (raw.equalsIgnoreCase("NULL")) null
      else if (raw.startsWith("'"))
        f.dataType match {
          case StringType =>
            raw.stripPrefix("'").stripSuffix("'").replace("''", "'")
          case other => throw new IllegalArgumentException(
            s"quoted value $raw for non-string column ${f.name}: $other")
        }
      else f.dataType match {
        case LongType => raw.toLong
        case DoubleType => raw.toDouble
        case BooleanType => raw == "1" || raw.equalsIgnoreCase("true")
        case _ => raw
      }
    })
  }

  /**
   * Every table in the dump: CREATE TABLE schemas + all INSERT rows,
   * distributed over `slices` partitions per table. Statements other than
   * CREATE/INSERT (SET, USE, GO batches, index DDL) are ignored.
   */
  def readSqlDumpTables(spark: SparkSession, path: String,
                        maxBytes: Long = 256L << 20,
                        slices: Int = 8): Map[String, DataFrame] = {
    val f = new java.io.File(path)
    require(f.exists, s"readSqlDump: no such file $path")
    require(f.length <= maxBytes,
      s"readSqlDump: $path is ${f.length} bytes > maxBytes=$maxBytes — a "
        + "dump this large is lake data, not a fixture; load it via a real "
        + "table path instead")
    val sql = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val stmts = splitStatements(sql)
    val defs = stmts.flatMap(parseCreate).map(d => d.name -> d).toMap
    require(defs.nonEmpty, s"readSqlDump: no CREATE TABLE statement in $path")
    val rows = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Row]]
    stmts.foreach {
      case InsertRe(rawName, values) =>
        val name = rawName.toLowerCase
        val d = defs.getOrElse(name, throw new IllegalArgumentException(
          s"readSqlDump: INSERT INTO $name before/without its CREATE TABLE"))
        val tuples = splitTopLevel(values.trim, ',').map(_.trim)
          .filter(_.nonEmpty)
          .map(t => parseTuple(t.stripPrefix("(").stripSuffix(")"), d.schema))
        val buf = rows.getOrElseUpdate(name,
          scala.collection.mutable.ArrayBuffer.empty)
        buf ++= tuples
      case _ => // SET/USE/GO/index DDL — ignored
    }
    defs.map { case (name, d) =>
      val rs = rows.getOrElse(name, scala.collection.mutable.ArrayBuffer.empty).toSeq
      name -> spark.createDataFrame(
        spark.sparkContext.parallelize(rs, math.max(1, math.min(slices, rs.size))),
        d.schema)
    }
  }

  /** Single-table convenience: the named table of the dump. */
  def readSqlDump(spark: SparkSession, path: String, table: String): DataFrame = {
    val all = readSqlDumpTables(spark, path)
    all.getOrElse(table.toLowerCase, throw new IllegalArgumentException(
      s"readSqlDump: table $table not in dump (has: ${all.keys.toSeq.sorted.mkString(", ")})"))
  }

  /** Escape one cell for a VALUES tuple (the fixture writer twin). */
  def sqlLiteral(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "1" else "0"
    case other => other.toString
  }
}
