package graft.lake

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Minimal TOML codec over Jackson nodes — the subset the reference's
  * rtoml-written metadata actually uses (`/root/reference/src/pydala/
  * utils/base.py:111-134`, fixture `/root/reference/test.toml:1-24`):
  * dotted table headers, bare/quoted keys, basic+literal strings,
  * integers, floats (incl. `1e6`), booleans, bare RFC-3339 date-times,
  * single- and multi-line arrays, inline tables, and `[[...]]`
  * array-of-tables sections (rtoml never emits those, but hand-edited
  * pydala lakes may carry them — in-place adoption shouldn't choke).
  *
  * Two rtoml-replacer conventions are reproduced for interop
  * (`utils/base.py:114,131` — pydala round-trips Python `None` as the
  * string "None"): the string value `"None"` parses to JSON null, and
  * null renders back as `"None"`.
  *
  * Date-times have no JSON type: they parse to their literal text and a
  * string that *looks* like an RFC-3339 date-time renders bare again, so
  * reference files round-trip losslessly.
  */
object Toml {

  import TimeFly.mapper

  private val DateTimeRe =
    """\d{4}-\d{2}-\d{2}([Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})?)?""".r

  private def isDateTime(s: String): Boolean =
    DateTimeRe.pattern.matcher(s).matches()

  // ---- parse ---------------------------------------------------------------

  def parse(text: String): ObjectNode = {
    val root = mapper.createObjectNode()
    var current = root
    logicalLines(text).foreach { line =>
      if (line.startsWith("[[")) {
        require(line.endsWith("]]"), s"malformed array-of-tables: $line")
        val path = splitPath(line.substring(2, line.length - 2).trim)
        val parent = navigate(root, path.init)
        val arr = parent.get(path.last) match {
          case a: ArrayNode => a
          case null => parent.putArray(path.last)
          case other => throw new IllegalArgumentException(
            s"key '${path.last}' is a ${other.getNodeType}, " +
              "not an array of tables")
        }
        current = arr.addObject()
      } else if (line.startsWith("[")) {
        require(line.endsWith("]"), s"malformed table header: $line")
        val path = splitPath(line.substring(1, line.length - 1).trim)
        current = navigate(root, path)
      } else {
        val eq = topLevelIndexOf(line, '=')
        require(eq > 0, s"malformed key-value line: $line")
        val key = parseKeySegment(line.substring(0, eq).trim)
        current.set[JsonNode](key, parseValue(line.substring(eq + 1).trim))
      }
    }
    root
  }

  /** Comment-stripped, trimmed, non-empty lines; lines continuing an
    * unclosed array/inline-table are joined into one logical line. */
  private def logicalLines(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val pending = new StringBuilder
    var depth = 0
    text.linesIterator.foreach { raw =>
      val line = stripComment(raw).trim
      if (line.nonEmpty || pending.nonEmpty) {
        if (pending.nonEmpty) pending.append(' ')
        pending.append(line)
        depth = bracketDepth(pending.toString)
        if (depth == 0 && pending.toString.trim.nonEmpty) {
          out += pending.toString.trim
          pending.clear()
        }
      }
    }
    require(pending.isEmpty || pending.toString.trim.isEmpty,
      s"unterminated value: $pending")
    out.toSeq
  }

  /** Walk `s` outside of quoted strings, feeding each unquoted char to
    * `f` with its index; returns the index where `f` says stop, or -1. */
  private def scanUnquoted(s: String)(f: (Char, Int) => Boolean): Int = {
    var i = 0
    var inBasic = false
    var inLiteral = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inBasic) {
        if (c == '\\') i += 1
        else if (c == '"') inBasic = false
      } else if (inLiteral) {
        if (c == '\'') inLiteral = false
      } else c match {
        case '"' => inBasic = true
        case '\'' => inLiteral = true
        case _ => if (f(c, i)) return i
      }
      i += 1
    }
    -1
  }

  private def stripComment(line: String): String = {
    val idx = scanUnquoted(line)((c, _) => c == '#')
    if (idx >= 0) line.substring(0, idx) else line
  }

  private def bracketDepth(s: String): Int = {
    var d = 0
    scanUnquoted(s) { (c, _) =>
      if (c == '[' || c == '{') d += 1
      else if (c == ']' || c == '}') d -= 1
      false
    }
    d
  }

  private def topLevelIndexOf(s: String, target: Char): Int =
    scanUnquoted(s)((c, _) => c == target)

  /** Split on `sep` at bracket depth 0, outside strings. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var d = 0
    scanUnquoted(s) { (c, i) =>
      if (c == '[' || c == '{') d += 1
      else if (c == ']' || c == '}') d -= 1
      else if (c == sep && d == 0) { parts += s.substring(start, i); start = i + 1 }
      false
    }
    parts += s.substring(start)
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def splitPath(s: String): Seq[String] =
    splitTop(s, '.').map(parseKeySegment)

  private def parseKeySegment(s: String): String =
    if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)
      unescape(s.substring(1, s.length - 1))
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      s.substring(1, s.length - 1)
    else {
      require(s.matches("[A-Za-z0-9_-]+"), s"invalid bare key: '$s'")
      s
    }

  private def navigate(root: ObjectNode, path: Seq[String]): ObjectNode =
    path.foldLeft(root) { (node, seg) =>
      node.get(seg) match {
        case o: ObjectNode => o
        // a dotted path through an array of tables targets its LAST
        // element (TOML §array-of-tables: `[a.b]` after `[[a]]`)
        case a: ArrayNode if a.size > 0 &&
            a.get(a.size - 1).isInstanceOf[ObjectNode] =>
          a.get(a.size - 1).asInstanceOf[ObjectNode]
        case null => node.putObject(seg)
        case other => throw new IllegalArgumentException(
          s"key '$seg' is a ${other.getNodeType}, not a table")
      }
    }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseValue(s: String): JsonNode = {
    if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2) {
      val str = unescape(s.substring(1, s.length - 1))
      // rtoml-replacer convention: "None" is Python None
      if (str == "None") mapper.nullNode() else mapper.getNodeFactory.textNode(str)
    } else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2) {
      val str = s.substring(1, s.length - 1)
      if (str == "None") mapper.nullNode() else mapper.getNodeFactory.textNode(str)
    } else if (s == "true") mapper.getNodeFactory.booleanNode(true)
    else if (s == "false") mapper.getNodeFactory.booleanNode(false)
    else if (s.startsWith("[")) {
      require(s.endsWith("]"), s"malformed array: $s")
      val arr = mapper.createArrayNode()
      splitTop(s.substring(1, s.length - 1), ',')
        .foreach(v => arr.add(parseValue(v)))
      arr
    } else if (s.startsWith("{")) {
      require(s.endsWith("}"), s"malformed inline table: $s")
      val obj = mapper.createObjectNode()
      splitTop(s.substring(1, s.length - 1), ',').foreach { kv =>
        val eq = topLevelIndexOf(kv, '=')
        require(eq > 0, s"malformed inline-table entry: $kv")
        obj.set[JsonNode](parseKeySegment(kv.substring(0, eq).trim),
          parseValue(kv.substring(eq + 1).trim))
      }
      obj
    } else if (isDateTime(s)) mapper.getNodeFactory.textNode(s)
    else {
      val clean = s.replace("_", "")
      try mapper.getNodeFactory.numberNode(java.lang.Long.parseLong(clean))
      catch {
        case _: NumberFormatException =>
          try mapper.getNodeFactory.numberNode(
            java.lang.Double.parseDouble(clean))
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"unparsable value: '$s'")
          }
      }
    }
  }

  // ---- render --------------------------------------------------------------

  def render(root: ObjectNode): String = {
    val sb = new StringBuilder
    renderTable(root, Nil, sb)
    sb.toString
  }

  private def renderKey(k: String): String =
    if (k.matches("[A-Za-z0-9_-]+")) k else "\"" + escape(k) + "\""

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def renderScalar(v: JsonNode): String = v match {
    case n if n.isNull => "\"None\"" // rtoml-replacer convention
    case t if t.isTextual =>
      if (isDateTime(t.asText)) t.asText else "\"" + escape(t.asText) + "\""
    case b if b.isBoolean => b.asBoolean.toString
    case n if n.isIntegralNumber => n.asLong.toString
    case n if n.isNumber => n.asDouble.toString
    case a: ArrayNode =>
      val items = (0 until a.size).map(i => renderScalar(a.get(i)))
      items.mkString("[", ", ", "]")
    case o: ObjectNode => // only reachable inside arrays: inline table
      val items = scala.collection.mutable.ArrayBuffer[String]()
      o.fields.forEachRemaining(e =>
        items += s"${renderKey(e.getKey)} = ${renderScalar(e.getValue)}")
      items.mkString("{ ", ", ", " }")
    case other =>
      throw new IllegalArgumentException(s"unrenderable node: $other")
  }

  private def isAot(n: JsonNode): Boolean = n match {
    case a: ArrayNode =>
      a.size > 0 && (0 until a.size).forall(i =>
        a.get(i).isInstanceOf[ObjectNode])
    case _ => false
  }

  private def renderTable(
      node: ObjectNode,
      path: Seq[String],
      sb: StringBuilder
  ): Unit = {
    val scalars = scala.collection.mutable.ArrayBuffer[(String, JsonNode)]()
    val tables = scala.collection.mutable.ArrayBuffer[(String, ObjectNode)]()
    val aots = scala.collection.mutable.ArrayBuffer[(String, ArrayNode)]()
    node.fields.forEachRemaining { e =>
      e.getValue match {
        case a: ArrayNode if isAot(a) => aots += ((e.getKey, a))
        case o: ObjectNode => tables += ((e.getKey, o))
        case v => scalars += ((e.getKey, v))
      }
    }
    if (path.nonEmpty &&
        (scalars.nonEmpty || (tables.isEmpty && aots.isEmpty))) {
      sb.append('[').append(path.map(renderKey).mkString(".")).append("]\n")
    }
    scalars.foreach { case (k, v) =>
      sb.append(renderKey(k)).append(" = ").append(renderScalar(v))
        .append('\n')
    }
    if (scalars.nonEmpty || (path.nonEmpty && tables.isEmpty && aots.isEmpty))
      sb.append('\n')
    tables.foreach { case (k, o) => renderTable(o, path :+ k, sb) }
    // non-empty all-table arrays render as [[...]] sections (sub-tables
    // inside an element attach to it via the dotted-path-targets-last-
    // element rule the parser implements); empty or mixed arrays stay
    // inline via renderScalar
    aots.foreach { case (k, a) =>
      val p = (path :+ k).map(renderKey).mkString(".")
      (0 until a.size).foreach { i =>
        sb.append("[[").append(p).append("]]\n")
        val el = a.get(i).asInstanceOf[ObjectNode]
        val elScalars =
          scala.collection.mutable.ArrayBuffer[(String, JsonNode)]()
        val elTables =
          scala.collection.mutable.ArrayBuffer[(String, ObjectNode)]()
        val elAots =
          scala.collection.mutable.ArrayBuffer[(String, ArrayNode)]()
        el.fields.forEachRemaining { e =>
          e.getValue match {
            case ar: ArrayNode if isAot(ar) => elAots += ((e.getKey, ar))
            case o: ObjectNode => elTables += ((e.getKey, o))
            case v => elScalars += ((e.getKey, v))
          }
        }
        elScalars.foreach { case (k2, v) =>
          sb.append(renderKey(k2)).append(" = ").append(renderScalar(v))
            .append('\n')
        }
        sb.append('\n')
        elTables.foreach { case (k2, o) => renderTable(o, path :+ k :+ k2, sb) }
        elAots.foreach { case (k2, ar) =>
          val nested = mapper.createObjectNode()
          nested.set[JsonNode](k2, ar)
          renderTable(nested, path :+ k, sb)
        }
      }
    }
  }
}
