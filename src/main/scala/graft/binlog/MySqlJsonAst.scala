package graft.binlog

import java.nio.charset.StandardCharsets

/** Tree form of MySQL binary JSON (same on-disk format [[MySqlJson]]
  * renders to text — json_binary.h) plus the JSON-diff algebra that
  * PARTIAL_UPDATE_ROWS events (`binlog_row_value_options=PARTIAL_JSON`)
  * ship: decode → apply diffs → re-encode, so a partial after-image
  * surfaces downstream exactly like a full one (binary JSON bytes).
  *
  * Encoding is server-faithful where observable: object members sort by
  * (key length, key bytes) as the server stores them; scalars take the
  * smallest integer width; containers use the small (u16) format until a
  * count/size/offset overflows, then the large (u32) format — mirroring
  * the decoder's `small` flag.
  */
object MySqlJsonAst {

  sealed trait JVal
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JStr(s: String) extends JVal
  final case class JInt(v: Long) extends JVal
  final case class JUInt(v: Long) extends JVal
  final case class JDouble(d: Double) extends JVal
  final case class JBool(b: Boolean) extends JVal
  case object JNull extends JVal
  /** 0x0f opaque payload (NEWDECIMAL etc.) carried through untouched. */
  final case class JOpaque(typeId: Int, data: Array[Byte]) extends JVal

  /** One JSON diff from a PARTIAL_UPDATE_ROWS after-image
    * (json_diff.h enum order: 0 = REPLACE, 1 = INSERT, 2 = REMOVE).
    */
  final case class JsonDiff(op: Int, path: String, value: Option[JVal])
  object DiffOp {
    val Replace = 0
    val Insert = 1
    val Remove = 2
  }

  /** Canonical text via the shared renderer — one formatting, everywhere. */
  def toText(v: JVal): String = MySqlJson.decodeToString(encode(v))

  // ---------------------------------------------------------------- decode

  private def u16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
  private def u32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) | ((d(o + 2) & 0xffL) << 16) |
      ((d(o + 3) & 0xffL) << 24)
  private def i64(d: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (d(o + i) & 0xffL) << (i * 8); i += 1 }
    v
  }
  private def varlen(d: Array[Byte], o: Int): (Int, Int) = {
    var len = 0
    var shift = 0
    var i = o
    var more = true
    while (more) {
      len |= (d(i) & 0x7f) << shift
      more = (d(i) & 0x80) != 0
      shift += 7
      i += 1
    }
    (len, i)
  }

  def decode(data: Array[Byte]): JVal = {
    require(data != null && data.nonEmpty, "empty binary JSON")
    value(data, data(0) & 0xff, 1)
  }

  private def value(d: Array[Byte], t: Int, off: Int): JVal = t match {
    case 0x00 => container(d, off, small = true, isObj = true)
    case 0x01 => container(d, off, small = false, isObj = true)
    case 0x02 => container(d, off, small = true, isObj = false)
    case 0x03 => container(d, off, small = false, isObj = false)
    case 0x04 => (d(off) & 0xff) match {
      case 0 => JNull
      case 1 => JBool(true)
      case _ => JBool(false)
    }
    case 0x05 => JInt(u16(d, off).toShort.toLong)
    case 0x06 => JUInt(u16(d, off).toLong)
    case 0x07 => JInt(u32(d, off).toInt.toLong)
    case 0x08 => JUInt(u32(d, off))
    case 0x09 => JInt(i64(d, off))
    case 0x0a => JUInt(i64(d, off))
    case 0x0b => JDouble(java.lang.Double.longBitsToDouble(i64(d, off)))
    case 0x0c =>
      val (len, s) = varlen(d, off)
      JStr(new String(d, s, len, StandardCharsets.UTF_8))
    case 0x0f =>
      val custom = d(off) & 0xff
      val (len, s) = varlen(d, off + 1)
      JOpaque(custom, java.util.Arrays.copyOfRange(d, s, s + len))
    case other =>
      throw new IllegalArgumentException(s"unknown binary-JSON type 0x${other.toHexString}")
  }

  private def container(d: Array[Byte], start: Int, small: Boolean, isObj: Boolean): JVal = {
    val w = if (small) 2 else 4
    def field(o: Int): Long = if (small) u16(d, o).toLong else u32(d, o)
    val count = field(start).toInt
    val keyEntries = start + 2 * w
    val valueEntries = keyEntries + (if (isObj) count * (w + 2) else 0)
    def member(i: Int): JVal = {
      val ve = valueEntries + i * (1 + w)
      val vt = d(ve) & 0xff
      val inlined = vt match {
        case 0x04 | 0x05 | 0x06 => true
        case 0x07 | 0x08 => !small
        case _ => false
      }
      if (inlined) value(d, vt, ve + 1)
      else value(d, vt, start + field(ve + 1).toInt)
    }
    if (isObj) {
      val fields = (0 until count).map { i =>
        val keyOff = field(keyEntries + i * (w + 2)).toInt
        val keyLen = u16(d, keyEntries + i * (w + 2) + w)
        new String(d, start + keyOff, keyLen, StandardCharsets.UTF_8) -> member(i)
      }
      JObj(fields.toVector)
    } else JArr((0 until count).map(member).toVector)
  }

  // ---------------------------------------------------------------- encode

  private def writeVarlen(o: java.io.ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    var more = true
    while (more) {
      val b = v & 0x7f
      v >>>= 7
      more = v != 0
      o.write(b | (if (more) 0x80 else 0))
    }
  }
  private def le(n: Int, v: Long): Array[Byte] = {
    val a = new Array[Byte](n)
    var i = 0
    while (i < n) { a(i) = ((v >> (i * 8)) & 0xff).toByte; i += 1 }
    a
  }

  /** (type byte, body bytes) of one value — a container's body is its full
    * serialized [count..values] block; scalars their payload.
    */
  private def enc(v: JVal): (Int, Array[Byte]) = v match {
    case JNull => (0x04, Array(0.toByte))
    case JBool(b) => (0x04, Array(if (b) 1.toByte else 2.toByte))
    case JInt(x) =>
      if (x >= Short.MinValue && x <= Short.MaxValue) (0x05, le(2, x))
      else if (x >= Int.MinValue && x <= Int.MaxValue) (0x07, le(4, x))
      else (0x09, le(8, x))
    case JUInt(x) =>
      if (x >= 0 && x <= 0xffffL) (0x06, le(2, x))
      else if (x >= 0 && x <= 0xffffffffL) (0x08, le(4, x))
      else (0x0a, le(8, x))
    case JDouble(d) => (0x0b, le(8, java.lang.Double.doubleToLongBits(d)))
    case JStr(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      val o = new java.io.ByteArrayOutputStream()
      writeVarlen(o, b.length)
      o.write(b)
      (0x0c, o.toByteArray)
    case JOpaque(t, data) =>
      val o = new java.io.ByteArrayOutputStream()
      o.write(t)
      writeVarlen(o, data.length)
      o.write(data)
      (0x0f, o.toByteArray)
    case JObj(fields0) =>
      // server order: members sorted by (key length, memcmp of the UTF-8
      // BYTES) — not Scala String order, which compares UTF-16 code units
      // and diverges for equal-length keys mixing supplementary-plane and
      // U+E000..U+FFFF characters
      val keyed = fields0.map(f => (f._1.getBytes(StandardCharsets.UTF_8), f._2))
      def memcmpLt(a: Array[Byte], b: Array[Byte]): Boolean = {
        if (a.length != b.length) return a.length < b.length
        var i = 0
        while (i < a.length) {
          val d = (a(i) & 0xff) - (b(i) & 0xff)
          if (d != 0) return d < 0
          i += 1
        }
        false
      }
      val fields = keyed.sortWith((x, y) => memcmpLt(x._1, y._1))
      encContainer(fields.map(_._1), fields.map(f => enc(f._2)), isObj = true)
    case JArr(items) =>
      encContainer(Vector.empty, items.map(enc), isObj = false)
  }

  private def inlineable(t: Int, small: Boolean): Boolean = t match {
    case 0x04 | 0x05 | 0x06 => true
    case 0x07 | 0x08 => !small
    case _ => false
  }

  private def encContainer(keys: Seq[Array[Byte]], vals: Seq[(Int, Array[Byte])],
                           isObj: Boolean): (Int, Array[Byte]) = {
    def build(small: Boolean): Option[Array[Byte]] = {
      val w = if (small) 2 else 4
      val count = vals.length
      val keyEntriesLen = if (isObj) count * (w + 2) else 0
      val valueEntriesLen = count * (1 + w)
      val keysStart = 2 * w + keyEntriesLen + valueEntriesLen
      val keysLen = keys.map(_.length).sum
      var valOff = keysStart + keysLen
      val keyOffs = keys.scanLeft(keysStart)((o, k) => o + k.length)
      val valOffs = new Array[Int](count)
      var i = 0
      while (i < count) {
        val (t, body) = vals(i)
        if (!inlineable(t, small)) { valOffs(i) = valOff; valOff += body.length }
        i += 1
      }
      val total = valOff
      val limit = if (small) 0xffff else Int.MaxValue
      if (count > limit || total > limit || (isObj && keys.exists(_.length > 0xffff)))
        return None
      val o = new java.io.ByteArrayOutputStream(total)
      o.write(le(w, count.toLong))
      o.write(le(w, total.toLong))
      if (isObj) {
        i = 0
        while (i < count) {
          o.write(le(w, keyOffs(i).toLong))
          o.write(le(2, keys(i).length.toLong))
          i += 1
        }
      }
      i = 0
      while (i < count) {
        val (t, body) = vals(i)
        o.write(t)
        if (inlineable(t, small)) {
          // inline value sits in the offset field, zero-padded to w
          o.write(body)
          o.write(new Array[Byte](w - body.length))
        } else o.write(le(w, valOffs(i).toLong))
        i += 1
      }
      keys.foreach(o.write)
      i = 0
      while (i < count) {
        val (t, body) = vals(i)
        if (!inlineable(t, small)) o.write(body)
        i += 1
      }
      Some(o.toByteArray)
    }
    val small = build(small = true)
    val body = small.getOrElse(build(small = false).getOrElse(
      throw new IllegalArgumentException("JSON document exceeds the large-format limits")))
    val objT = if (small.isDefined) (if (isObj) 0x00 else 0x02) else (if (isObj) 0x01 else 0x03)
    (objT, body)
  }

  def encode(v: JVal): Array[Byte] = {
    val (t, body) = enc(v)
    val out = new Array[Byte](body.length + 1)
    out(0) = t.toByte
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }

  // ------------------------------------------------------------ diff apply

  sealed private trait Leg
  private final case class Member(name: String) extends Leg
  private final case class Index(i: Int) extends Leg

  /** Diff paths are concrete: `$`, `.member`, `."quoted member"`, `[N]` —
    * the server never writes wildcards/ranges into a binlog diff.
    */
  private def parsePath(path: String): List[Leg] = {
    val s = path.trim
    require(s.nonEmpty && s.charAt(0) == '$', s"JSON diff path must start with $$: '$path'")
    var i = 1
    val legs = List.newBuilder[Leg]
    while (i < s.length) {
      s.charAt(i) match {
        case '.' =>
          i += 1
          if (i < s.length && s.charAt(i) == '"') {
            val sb = new StringBuilder
            i += 1
            while (i < s.length && s.charAt(i) != '"') {
              if (s.charAt(i) == '\\' && i + 1 < s.length) i += 1
              sb.append(s.charAt(i)); i += 1
            }
            require(i < s.length, s"unterminated quoted member in path '$path'")
            i += 1
            legs += Member(sb.toString)
          } else {
            val start = i
            while (i < s.length && s.charAt(i) != '.' && s.charAt(i) != '[') i += 1
            require(i > start, s"empty member name in path '$path'")
            legs += Member(s.substring(start, i))
          }
        case '[' =>
          val end = s.indexOf(']', i)
          require(end > i + 1, s"bad array leg in path '$path'")
          val idx = s.substring(i + 1, end).trim
          require(idx.forall(_.isDigit), s"non-numeric array index in diff path '$path'")
          legs += Index(idx.toInt)
          i = end + 1
        case c => throw new IllegalArgumentException(s"unexpected '$c' in path '$path'")
      }
    }
    legs.result()
  }

  /** Apply one server-semantics diff: REPLACE needs the path to exist,
    * INSERT adds a new member / splices an array element (appending past
    * the end), REMOVE deletes an existing one. A non-applicable diff is a
    * hard error — it means the before-image and the diff disagree, and
    * continuing would materialize a document the server never had.
    */
  private def applyOne(doc: JVal, d: JsonDiff): JVal = {
    val legs = parsePath(d.path)
    def fail(msg: String): Nothing =
      throw new IllegalStateException(s"JSON diff ${d.op} at '${d.path}': $msg")
    def go(v: JVal, rest: List[Leg]): JVal = (v, rest) match {
      case (_, Nil) => d.op match {
        case DiffOp.Replace => d.value.getOrElse(fail("REPLACE without value"))
        case DiffOp.Insert => fail("INSERT at an existing location")
        case DiffOp.Remove => fail("cannot REMOVE the document root via this path")
      }
      case (JObj(fields), Member(name) :: Nil) =>
        val at = fields.indexWhere(_._1 == name)
        d.op match {
          case DiffOp.Replace =>
            if (at < 0) fail(s"member '$name' absent")
            JObj(fields.updated(at, name -> d.value.getOrElse(fail("no value"))))
          case DiffOp.Insert =>
            if (at >= 0) fail(s"member '$name' already present")
            JObj(fields :+ (name -> d.value.getOrElse(fail("no value"))))
          case DiffOp.Remove =>
            if (at < 0) fail(s"member '$name' absent")
            JObj(fields.patch(at, Nil, 1))
          case other => fail(s"unknown op $other")
        }
      case (JArr(items), Index(i) :: Nil) =>
        d.op match {
          case DiffOp.Replace =>
            if (i >= items.length) fail(s"index $i past length ${items.length}")
            JArr(items.updated(i, d.value.getOrElse(fail("no value"))))
          case DiffOp.Insert =>
            val v2 = d.value.getOrElse(fail("no value"))
            if (i >= items.length) JArr(items :+ v2)
            else JArr(items.patch(i, Seq(v2), 0))
          case DiffOp.Remove =>
            if (i >= items.length) fail(s"index $i past length ${items.length}")
            JArr(items.patch(i, Nil, 1))
          case other => fail(s"unknown op $other")
        }
      case (JObj(fields), Member(name) :: tail) =>
        val at = fields.indexWhere(_._1 == name)
        if (at < 0) fail(s"member '$name' absent on the path")
        JObj(fields.updated(at, name -> go(fields(at)._2, tail)))
      case (JArr(items), Index(i) :: tail) =>
        if (i >= items.length) fail(s"index $i past length ${items.length} on the path")
        JArr(items.updated(i, go(items(i), tail)))
      case (other, leg :: _) =>
        fail(s"cannot traverse $leg into ${other.getClass.getSimpleName}")
    }
    if (legs.isEmpty) go(doc, Nil) else go(doc, legs)
  }

  def applyDiffs(doc: JVal, diffs: Seq[JsonDiff]): JVal =
    diffs.foldLeft(doc)(applyOne)
}
