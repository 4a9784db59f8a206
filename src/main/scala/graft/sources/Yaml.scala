package graft.sources

import org.json4s._

/** Minimal YAML-subset parser covering the reference's config surface —
  * the primary DDL entry point (`load_yaml_config`,
  * dabstract/utils.py:13-146, exercised by the yaml files under
  * /root/reference/examples/ in the dirs/dp/dbs config folders).
  *
  * Supported: block maps and block lists by indentation, flow lists
  * (`[a, b]`, possibly nested and spanning lines), single/double-quoted
  * and plain scalars (bool/int/float/null inference), `#` comments,
  * anchors/aliases (`&name` / `*name`), and the reference's custom tags:
  *
  *  - `!join [a, b]`     → "ab"          (utils.py:101-104)
  *  - `!usjoin [a, b]`   → "a_b"         (utils.py:106-109)
  *  - `!pathjoin [a, b]` → "a/b"         (utils.py:111-114)
  *  - `!kwarg [a, b]`    → kwargs(a)(b), or the dotted path ".a.b" when
  *                         absent          (utils.py:116-127)
  *  - `!class [pkg.Cls]` → the class-path string; the JVM engine resolves
  *                         names through its registries instead of
  *                         importing modules (utils.py:129-135)
  *
  * Output is a json4s AST, so the config pipeline is shared with the
  * JSON frontend ([[ConfigSource]]). No external YAML library — the
  * offline build ships none — and no support for YAML features the
  * reference configs never use (block scalars, multi-doc, merge keys).
  */
object Yaml {

  def parse(text: String, kwargs: Map[String, Any] = Map.empty): JValue = {
    val lines = logicalLines(text)
    if (lines.isEmpty) JObject()
    else new Parser(lines, kwargs).parseNode(0)
  }

  /** Parsed YAML as plain Scala values (maps/seqs/scalars) — the shape
    * `parse`'s `kwargs` expects, so one config can feed another's
    * `!kwarg` lookups (the reference's `load_yaml_config(..., **kwargs)`
    * injection, e.g. the dirs→db config flow in examples/DCASE2020Task1).
    */
  def toPlain(v: JValue): Any = v match {
    case JObject(fs) => fs.map { case (k, x) => k -> toPlain(x) }.toMap
    case JArray(xs) => xs.map(toPlain)
    case JString(s) => s
    case JInt(n) => n.toLong
    case JLong(n) => n
    case JDouble(d) => d
    case JBool(b) => b
    case JNull | JNothing => null
    case other => other.toString
  }

  /** Strip comments/blank lines, record indentation, and merge lines
    * while a flow `[` is unbalanced (multi-line flow lists).
    */
  private def logicalLines(text: String): Vector[(Int, String)] = {
    val raw = text.split("\n", -1).toVector
      .map(stripComment)
      .filter(_.trim.nonEmpty)
    val out = Vector.newBuilder[(Int, String)]
    var pending: Option[(Int, String)] = None
    raw.foreach { l =>
      val merged = pending match {
        case Some((ind, acc)) => (ind, acc + " " + l.trim)
        case None => (l.takeWhile(_ == ' ').length, l.trim)
      }
      if (bracketDepth(merged._2) > 0) pending = Some(merged)
      else { pending = None; out += merged }
    }
    pending.foreach(p => throw new IllegalArgumentException(
      s"yaml: unbalanced '[' in '${p._2.take(60)}'"))
    out.result()
  }

  private def stripComment(l: String): String = {
    var q = ' '
    var i = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (q != ' ') { if (c == q) q = ' ' }
      else if (c == '\'' || c == '"') q = c
      else if (c == '#' && (i == 0 || l.charAt(i - 1) == ' ')) return l.take(i)
      i += 1
    }
    l
  }

  private def bracketDepth(s: String): Int = {
    var d = 0; var q = ' '
    s.foreach { c =>
      if (q != ' ') { if (c == q) q = ' ' }
      else if (c == '\'' || c == '"') q = c
      else if (c == '[') d += 1
      else if (c == ']') d -= 1
    }
    d
  }

  private final class Parser(lines0: Vector[(Int, String)], kwargs: Map[String, Any]) {
    private val lines = scala.collection.mutable.ArrayBuffer.from(lines0)
    private var i = 0
    private val anchors = scala.collection.mutable.Map.empty[String, JValue]

    def parseNode(minIndent: Int): JValue = {
      if (i >= lines.length || lines(i)._1 < minIndent) JNull
      else if (isListItem(lines(i)._2)) parseList(lines(i)._1)
      else parseMap(lines(i)._1)
    }

    private def isListItem(t: String): Boolean = t == "-" || t.startsWith("- ")

    private def parseMap(indent: Int): JValue = {
      val fields = List.newBuilder[JField]
      while (i < lines.length && lines(i)._1 == indent && !isListItem(lines(i)._2)) {
        val txt = lines(i)._2
        val ci = keyColon(txt)
        require(ci >= 0, s"yaml: expected 'key:' in '$txt'")
        val key = unquote(txt.take(ci).trim)
        val rest = txt.drop(ci + 1).trim
        i += 1
        val value =
          if (rest.nonEmpty) blockAnchorOr(rest, indent)
          else if (i < lines.length && lines(i)._1 > indent) parseNode(lines(i)._1)
          else JNull
        fields += key -> value
      }
      JObject(fields.result())
    }

    private def parseList(indent: Int): JValue = {
      val items = List.newBuilder[JValue]
      while (i < lines.length && lines(i)._1 == indent && isListItem(lines(i)._2)) {
        val txt = lines(i)._2
        val rest = txt.drop(1).trim
        if (rest.isEmpty) { i += 1; items += parseNode(indent + 1) }
        else if (keyColon(rest) >= 0) {
          // "- key: v" starts a map item: re-park the rest at the item's
          // own column so following keys at that indent join the same map
          val itemIndent = indent + (txt.length - rest.length)
          lines(i) = (itemIndent, rest)
          items += parseMap(itemIndent)
        } else { i += 1; items += flowValue(rest) }
      }
      JArray(items.result())
    }

    /** Inline map value that may be a bare `&name` anchoring a BLOCK value
      * (the common YAML defaults pattern: `key: &a` followed by an indented
      * map). flowValue alone would bind the anchor to an empty scalar and
      * parseMap's indent check would silently drop the block lines; here the
      * following indented node is parsed and bound to the anchor instead.
      * Any other inline rest (including `&name <inline scalar/list>`) goes
      * through flowValue unchanged.
      */
    private def blockAnchorOr(rest: String, indent: Int): JValue = {
      if (rest.startsWith("&") &&
          rest.drop(1).forall(c => !c.isWhitespace) && rest.length > 1) {
        val name = rest.drop(1)
        val v =
          if (i < lines.length && lines(i)._1 > indent) parseNode(lines(i)._1)
          else JNull
        anchors(name) = v
        v
      } else flowValue(rest)
    }

    /** `key:` separator — first ':' at flow depth 0 outside quotes that
      * is followed by a space or ends the line.
      */
    private def keyColon(s: String): Int = {
      var d = 0; var q = ' '
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        if (q != ' ') { if (c == q) q = ' ' }
        else if (c == '\'' || c == '"') q = c
        else if (c == '[') d += 1
        else if (c == ']') d -= 1
        else if (c == ':' && d == 0 && (j + 1 == s.length || s.charAt(j + 1) == ' '))
          return j
        j += 1
      }
      -1
    }

    private def flowValue(s0: String): JValue = {
      val s = s0.trim
      if (s.startsWith("&")) {
        val name = s.drop(1).takeWhile(c => !c.isWhitespace)
        val v = flowValue(s.drop(1 + name.length))
        anchors(name) = v
        v
      } else if (s.startsWith("*")) {
        val name = s.drop(1).trim
        anchors.getOrElse(name,
          throw new IllegalArgumentException(s"yaml: undefined alias *$name"))
      } else if (s.startsWith("!")) {
        val tag = s.drop(1).takeWhile(c => !c.isWhitespace && c != '[')
        val rest = s.drop(1 + tag.length).trim
        require(rest.startsWith("["), s"yaml: tag !$tag expects a flow list")
        applyTag(tag, flowItems(rest))
      } else if (s.startsWith("[")) {
        JArray(flowItems(s))
      } else scalar(s)
    }

    /** Elements of a `[...]` flow list, split on depth-0 commas. */
    private def flowItems(s: String): List[JValue] = {
      require(s.startsWith("[") && s.endsWith("]"), s"yaml: bad flow list '$s'")
      val body = s.drop(1).dropRight(1)
      val parts = List.newBuilder[String]
      var d = 0; var q = ' '
      val cur = new StringBuilder
      body.foreach { c =>
        if (q != ' ') { if (c == q) q = ' '; cur += c }
        else if (c == '\'' || c == '"') { q = c; cur += c }
        else if (c == '[') { d += 1; cur += c }
        else if (c == ']') { d -= 1; cur += c }
        else if (c == ',' && d == 0) { parts += cur.result(); cur.clear() }
        else cur += c
      }
      parts += cur.result()
      parts.result().map(_.trim).filter(_.nonEmpty).map(flowValue)
    }

    private def applyTag(tag: String, items: List[JValue]): JValue = tag match {
      case "join"     => JString(items.map(str).mkString(""))
      case "usjoin"   => JString(items.map(str).mkString("_"))
      case "pathjoin" => JString(items.map(str).mkString("/"))
      case "kwarg" =>
        val keys = items.map(str)
        def walk(cur: Any, ks: List[String]): Option[Any] = ks match {
          case Nil => Some(cur)
          case k :: t => cur match {
            case m: Map[_, _] =>
              m.asInstanceOf[Map[String, Any]].get(k).flatMap(walk(_, t))
            case _ => None
          }
        }
        walk(kwargs, keys) match {
          case Some(v) => anyToJ(v)
          // reference fallback: the dotted lookup path (utils.py:119-127)
          case None => JString(keys.mkString(".", ".", ""))
        }
      case "class" =>
        require(items.length == 1, "yaml: !class expects one element")
        JString(str(items.head))
      case t => throw new IllegalArgumentException(s"yaml: unsupported tag !$t")
    }

    private def str(v: JValue): String = v match {
      case JString(x) => x
      case JInt(x) => x.toString
      case JLong(x) => x.toString
      case JDouble(x) => if (x == x.floor && x.abs < 1e15) x.toLong.toString else x.toString
      case JBool(x) => x.toString
      case JNull => "null"
      case other => other.toString
    }

    private def anyToJ(v: Any): JValue = v match {
      case s: String => JString(s)
      case b: Boolean => JBool(b)
      case n: Int => JInt(n)
      case n: Long => JInt(n)
      case n: Double => JDouble(n)
      case m: Map[_, _] =>
        JObject(m.asInstanceOf[Map[String, Any]].toList.map { case (k, x) => k -> anyToJ(x) })
      case xs: Seq[_] => JArray(xs.toList.map(anyToJ))
      case null => JNull
      case other => JString(other.toString)
    }

    private def scalar(s: String): JValue = s match {
      case q if (q.startsWith("'") && q.endsWith("'") && q.length >= 2) ||
        (q.startsWith("\"") && q.endsWith("\"") && q.length >= 2) => JString(unquote(q))
      case "true" | "True" | "yes" => JBool(true)
      case "false" | "False" | "no" => JBool(false)
      case "null" | "~" | "None" => JNull
      case IntRe() => JInt(BigInt(s))
      case FloatRe() => JDouble(s.toDouble)
      case other => JString(other)
    }
  }

  private val IntRe = "[+-]?\\d+".r
  private val FloatRe = "[+-]?(?:\\d+\\.\\d*|\\.\\d+|\\d+)(?:[eE][+-]?\\d+)?".r

  private def unquote(s: String): String =
    if ((s.startsWith("'") && s.endsWith("'") && s.length >= 2) ||
      (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2))
      s.drop(1).dropRight(1)
    else s
}
