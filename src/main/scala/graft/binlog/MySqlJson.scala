package graft.binlog

/** Decoder for MySQL's binary JSON column format (type id 245) — the
  * in-log representation every 5.7/8.x server writes for JSON columns.
  * Layout follows the public format description in the server's
  * json_binary.h header:
  *
  * {{{
  * doc     ::= type value
  * type    ::= 0x00 small-object | 0x01 large-object | 0x02 small-array |
  *             0x03 large-array  | 0x04 literal | 0x05 int16 | 0x06 uint16 |
  *             0x07 int32 | 0x08 uint32 | 0x09 int64 | 0x0a uint64 |
  *             0x0b double | 0x0c utf8 string | 0x0f opaque
  * object  ::= count size key-entry* value-entry* key* value*
  * array   ::= count size value-entry* value*
  * }}}
  *
  * count/size/offsets are uint16 in the small format, uint32 in the large;
  * value entries inline literals/int16/uint16 (plus int32/uint32 in large)
  * in the offset field; offsets are relative to the first byte of the
  * containing object/array (its count field). String/opaque lengths are
  * 7-bit little-endian varints with high-bit continuation.
  *
  * Output is canonical JSON text. Opaque NEWDECIMAL payloads decode through
  * [[MySqlDecimal]] (precision, scale header bytes); any other opaque type
  * surfaces as a `"base64:<type>:<data>"` string rather than being dropped.
  */
object MySqlJson {

  def decodeToString(data: Array[Byte]): String = {
    if (data == null || data.isEmpty) return "null"
    val sb = new java.lang.StringBuilder(data.length * 2)
    value(data, data(0) & 0xff, 1, sb)
    sb.toString
  }

  private def u16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
  private def i16(d: Array[Byte], o: Int): Int = u16(d, o).toShort.toInt
  private def u32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) | ((d(o + 2) & 0xffL) << 16) |
      ((d(o + 3) & 0xffL) << 24)
  private def i32(d: Array[Byte], o: Int): Int = u32(d, o).toInt
  private def i64(d: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (d(o + i) & 0xffL) << (i * 8); i += 1 }
    v
  }

  /** 7-bit LE varint with high-bit continuation; returns (value, nextOff). */
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

  private def escape(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Render the value of `t` whose body starts at `off`. */
  private def value(d: Array[Byte], t: Int, off: Int, sb: java.lang.StringBuilder): Unit =
    t match {
      case 0x00 => container(d, off, small = true, isObj = true, sb)
      case 0x01 => container(d, off, small = false, isObj = true, sb)
      case 0x02 => container(d, off, small = true, isObj = false, sb)
      case 0x03 => container(d, off, small = false, isObj = false, sb)
      case 0x04 => sb.append((d(off) & 0xff) match {
        case 0 => "null"
        case 1 => "true"
        case _ => "false"
      })
      case 0x05 => sb.append(i16(d, off))
      case 0x06 => sb.append(u16(d, off))
      case 0x07 => sb.append(i32(d, off))
      case 0x08 => sb.append(u32(d, off))
      case 0x09 => sb.append(i64(d, off))
      case 0x0a => sb.append(java.lang.Long.toUnsignedString(i64(d, off)))
      case 0x0b => sb.append(java.lang.Double.longBitsToDouble(i64(d, off)))
      case 0x0c =>
        val (len, s) = varlen(d, off)
        escape(new String(d, s, len, java.nio.charset.StandardCharsets.UTF_8), sb)
      case 0x0f =>
        val custom = d(off) & 0xff
        val (len, s) = varlen(d, off + 1)
        if (custom == ColType.NewDecimal && len >= 2) {
          val precision = d(s) & 0xff
          val scale = d(s + 1) & 0xff
          sb.append(MySqlDecimal.decode(d, s + 2, precision, scale).toPlainString)
        } else {
          val b64 = java.util.Base64.getEncoder
            .encodeToString(java.util.Arrays.copyOfRange(d, s, s + len))
          escape(s"base64:$custom:$b64", sb)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown binary-JSON type 0x${other.toHexString}")
    }

  /** Object/array: `start` points at the count field (the base every
    * offset inside the container is relative to).
    */
  private def container(d: Array[Byte], start: Int, small: Boolean, isObj: Boolean,
                        sb: java.lang.StringBuilder): Unit = {
    val w = if (small) 2 else 4
    def field(o: Int): Long = if (small) u16(d, o).toLong else u32(d, o)
    val count = field(start).toInt
    val keyEntries = start + 2 * w
    val valueEntries = keyEntries + (if (isObj) count * (w + 2) else 0)
    sb.append(if (isObj) '{' else '[')
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(',')
      if (isObj) {
        val keyOff = field(keyEntries + i * (w + 2)).toInt
        val keyLen = u16(d, keyEntries + i * (w + 2) + w)
        escape(new String(d, start + keyOff, keyLen,
          java.nio.charset.StandardCharsets.UTF_8), sb)
        sb.append(':')
      }
      val ve = valueEntries + i * (1 + w)
      val vt = d(ve) & 0xff
      val inlined = vt match {
        case 0x04 | 0x05 | 0x06 => true
        case 0x07 | 0x08 => !small // int32/uint32 fit the 4-byte large field
        case _ => false
      }
      if (inlined) value(d, vt, ve + 1, sb)
      else value(d, vt, start + field(ve + 1).toInt, sb)
      i += 1
    }
    sb.append(if (isObj) '}' else ']')
  }
}
