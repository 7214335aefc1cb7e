package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Chilean RUT validation/canonicalization.
  *
  * Semantics derived from the reference's validator
  * (`etl-gcs-cloudsql/src/utils/validations.ts:54-109`):
  *   - accepted shape: `^(\d{1,3}(\.\d{3}){0,2}|\d{7,8})-[0-9Kk]$`
  *     (optionally dotted body, mandatory hyphen, digit-or-K check char)
  *   - check digit: mod-11 with multipliers cycling 2..7 from the
  *     rightmost body digit; `11 - sum % 11`, where 11 -> '0', 10 -> 'K'
  *     (`validations.ts:78-90`)
  *   - canonical output: dots stripped, uppercase K, `NNNNNNNN-D`
  *     (`validations.ts:92-107`)
  *
  * Pure JVM helpers; called from both the Catalyst expressions
  * ([[RutIsValid]], [[RutFormat]]) and directly from driver-side code.
  * Static and allocation-light so generated code can call it per-row.
  */
object RutUtil {
  private val Shape = "^(\\d{1,3}(\\.\\d{3}){0,2}|\\d{7,8})-[0-9Kk]$".r

  /** Expected check character for a bare digit body (no dots/hyphen). */
  def checkDigit(body: String): Char = {
    var sum = 0
    var mult = 2
    var i = body.length - 1
    while (i >= 0) {
      sum += (body.charAt(i) - '0') * mult
      mult = if (mult == 7) 2 else mult + 1
      i -= 1
    }
    11 - (sum % 11) match {
      case 11 => '0'
      case 10 => 'K'
      case d  => ('0' + d).toChar
    }
  }

  /** Canonical `BODY-DV` (no dots, uppercase) or null when invalid. */
  def formatOrNull(raw: String): String = {
    if (raw == null) return null
    val s = raw.trim
    if (Shape.findFirstIn(s).isEmpty) return null
    val hyphen = s.lastIndexOf('-')
    val body = s.substring(0, hyphen).replace(".", "")
    val dv = Character.toUpperCase(s.charAt(hyphen + 1))
    if (checkDigit(body) == dv) body + "-" + dv else null
  }

  def isValid(raw: String): Boolean = formatOrNull(raw) != null

  // UTF8String bridges for codegen / InternalRow evaluation.
  def formatOrNullUTF8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val out = formatOrNull(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  def isValidUTF8(s: UTF8String): Boolean =
    s != null && formatOrNull(s.toString) != null
}
