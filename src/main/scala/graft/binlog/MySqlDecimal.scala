package graft.binlog

import java.math.{BigDecimal => JBigDecimal, BigInteger}

/** MySQL on-disk NEWDECIMAL codec → `java.math.BigDecimal`.
  *
  * Format (semantics per the reference port of MySQL `strings/decimal.c`,
  * `/root/reference/src/cdc/mysql/Decimal.java:113-262`): the value is split
  * into base-10⁹ "limbs" of 9 decimal digits, each stored as a 4-byte
  * big-endian int; leading/trailing partial limbs use 1-4 bytes
  * (`dig2bytes`). The first byte's high bit is the sign (set = positive);
  * for negative values every byte is bitwise-complemented. We decode
  * directly into a BigDecimal instead of reproducing the reference's
  * limb-array struct — same numbers, Java-native representation.
  */
object MySqlDecimal {
  final val DigPerDec = 9
  /** bytes needed for 0..9 leading/trailing decimal digits (`Decimal.java:45`) */
  final val dig2bytes: Array[Int] = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)

  /** Size in bytes of a packed decimal(precision, scale)
    * (`Decimal.java:113-122`).
    */
  def binSize(precision: Int, scale: Int): Int = {
    val intg = precision - scale
    val intg0 = intg / DigPerDec
    val frac0 = scale / DigPerDec
    val intg0x = intg - intg0 * DigPerDec
    val frac0x = scale - frac0 * DigPerDec
    intg0 * 4 + dig2bytes(intg0x) + frac0 * 4 + dig2bytes(frac0x)
  }

  /** Big-endian signed read of 1-4 bytes with sign extension
    * (myisampack `mi_sintNkorr`, `Decimal.java:79-103`).
    */
  private def sintBE(a: Array[Byte], from: Int, n: Int): Int = {
    var x = a(from).toInt // sign-extends
    var i = 1
    while (i < n) { x = (x << 8) | (a(from + i) & 0xff); i += 1 }
    x
  }

  private val pow10: Array[Long] =
    Array(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L, 10000000L, 100000000L, 1000000000L)

  /** Decode `binSize(precision, scale)` bytes at `off` into a BigDecimal.
    * Does not mutate the input (unlike the reference, which flips the sign
    * bit in place, `Decimal.java:153`).
    *
    * precision ≤ 18 (the overwhelmingly common case — every default-width
    * money/metric column) takes a long-accumulator fast path: no array
    * copy, no BigInteger, one `BigDecimal.valueOf`. Wider decimals fall
    * back to the limb-by-limb BigInteger build.
    */
  def decode(bytes: Array[Byte], off: Int, precision: Int, scale: Int): JBigDecimal =
    if (precision <= 18) decodeLong(bytes, off, precision, scale)
    else decodeBig(bytes, off, precision, scale)

  private def decodeLong(bytes: Array[Byte], off: Int, precision: Int, scale: Int): JBigDecimal = {
    val intg = precision - scale
    val intg0 = intg / DigPerDec
    val frac0 = scale / DigPerDec
    val intg0x = intg - intg0 * DigPerDec
    val frac0x = scale - frac0 * DigPerDec

    val positive = (bytes(off) & 0x80) != 0
    val mask = if (positive) 0 else -1
    // first byte's sign bit flips BEFORE sign extension (matches the
    // copy-then-flip of the wide path bit for bit)
    def beField(from: Int, n: Int): Int = {
      var x =
        if (from == off) ((bytes(from) ^ 0x80).toByte).toInt
        else bytes(from).toInt
      var i = 1
      while (i < n) { x = (x << 8) | (bytes(from + i) & 0xff); i += 1 }
      x ^ mask
    }

    var unscaled = 0L
    var p = off
    if (intg0x > 0) {
      val n = dig2bytes(intg0x)
      unscaled = beField(p, n).toLong
      p += n
    }
    var i = 0
    while (i < intg0 + frac0) {
      unscaled = unscaled * 1000000000L + beField(p, 4)
      p += 4; i += 1
    }
    if (frac0x > 0) {
      val n = dig2bytes(frac0x)
      unscaled = unscaled * pow10(frac0x) + beField(p, n)
    }
    JBigDecimal.valueOf(if (positive) unscaled else -unscaled, scale)
  }

  private def decodeBig(bytes: Array[Byte], off: Int, precision: Int, scale: Int): JBigDecimal = {
    val intg = precision - scale
    val intg0 = intg / DigPerDec
    val frac0 = scale / DigPerDec
    val intg0x = intg - intg0 * DigPerDec
    val frac0x = scale - frac0 * DigPerDec
    val size = binSize(precision, scale)

    val positive = (bytes(off) & 0x80) != 0
    val mask = if (positive) 0 else -1
    // copy with sign bit flipped so limb reads see the raw magnitude
    val a = java.util.Arrays.copyOfRange(bytes, off, off + size)
    a(0) = (a(0) ^ 0x80).toByte

    var unscaled = BigInteger.ZERO
    val base = BigInteger.valueOf(1000000000L)
    var p = 0
    if (intg0x > 0) {
      val n = dig2bytes(intg0x)
      unscaled = BigInteger.valueOf((sintBE(a, p, n) ^ mask).toLong)
      p += n
    }
    var i = 0
    while (i < intg0) {
      unscaled = unscaled.multiply(base)
        .add(BigInteger.valueOf((sintBE(a, p, 4) ^ mask).toLong))
      p += 4; i += 1
    }
    i = 0
    while (i < frac0) {
      unscaled = unscaled.multiply(base)
        .add(BigInteger.valueOf((sintBE(a, p, 4) ^ mask).toLong))
      p += 4; i += 1
    }
    if (frac0x > 0) {
      val n = dig2bytes(frac0x)
      unscaled = unscaled.multiply(BigInteger.TEN.pow(frac0x))
        .add(BigInteger.valueOf((sintBE(a, p, n) ^ mask).toLong))
    }
    if (!positive) unscaled = unscaled.negate()
    new JBigDecimal(unscaled, scale)
  }

  /** Inverse of [[decode]] — used by the fixture encoder and round-trip
    * property tests (no live mysqld in this environment, SURVEY §5).
    */
  def encode(value: JBigDecimal, precision: Int, scale: Int): Array[Byte] = {
    val v = value.setScale(scale)
    require(v.precision - v.scale <= precision - scale,
      s"value $value does not fit decimal($precision,$scale)")
    val intg = precision - scale
    val intg0 = intg / DigPerDec
    val frac0 = scale / DigPerDec
    val intg0x = intg - intg0 * DigPerDec
    val frac0x = scale - frac0 * DigPerDec
    val positive = v.signum >= 0
    var unscaled = v.unscaledValue.abs

    // peel limbs off from the least-significant end
    val base = BigInteger.valueOf(1000000000L)
    var fracPartial = 0
    if (frac0x > 0) {
      val Array(q, r) = unscaled.divideAndRemainder(BigInteger.TEN.pow(frac0x))
      fracPartial = r.intValue; unscaled = q
    }
    val fracLimbs = new Array[Int](frac0)
    var i = frac0 - 1
    while (i >= 0) {
      val Array(q, r) = unscaled.divideAndRemainder(base)
      fracLimbs(i) = r.intValue; unscaled = q; i -= 1
    }
    val intgLimbs = new Array[Int](intg0)
    i = intg0 - 1
    while (i >= 0) {
      val Array(q, r) = unscaled.divideAndRemainder(base)
      intgLimbs(i) = r.intValue; unscaled = q; i -= 1
    }
    val intgPartial = unscaled.intValue

    val out = new Array[Byte](binSize(precision, scale))
    var p = 0
    def putBE(x: Int, n: Int): Unit = {
      var j = n - 1
      var v0 = x
      while (j >= 0) { out(p + j) = (v0 & 0xff).toByte; v0 >>>= 8; j -= 1 }
      p += n
    }
    if (intg0x > 0) putBE(intgPartial, dig2bytes(intg0x))
    intgLimbs.foreach(putBE(_, 4))
    fracLimbs.foreach(putBE(_, 4))
    if (frac0x > 0) putBE(fracPartial, dig2bytes(frac0x))

    // MySQL decimal2bin: negative values store the complement of every
    // byte; the first byte's high bit is then flipped unconditionally
    // (decode reverses in the same order).
    if (!positive) {
      var j = 0
      while (j < out.length) { out(j) = (~out(j)).toByte; j += 1 }
    }
    out(0) = (out(0) ^ 0x80).toByte
    out
  }
}
