package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar builtin surface (docs/language/builtins.md
  * — string, math, timestamp and utility functions) mapped 1:1 onto
  * Spark's codegen'd `functions._`. Nothing here is custom: the point
  * of the table is that a VPL user's whole scalar vocabulary exists
  * natively (and therefore vectorizes / pushes down) — custom
  * expressions are reserved for what Spark genuinely lacks
  * (SimHash64, WordShingles, DotProduct).
  */
object VplBuiltins {

  // strings
  def len(s: Column): Column = length(s)
  def upperF(s: Column): Column = upper(s)
  def lowerF(s: Column): Column = lower(s)
  def trimF(s: Column): Column = trim(s)
  def containsF(s: Column, sub: String): Column = s.contains(sub)
  def startsWith(s: Column, p: String): Column = s.startsWith(p)
  def endsWith(s: Column, p: String): Column = s.endsWith(p)
  def splitF(s: Column, sep: String): Column = split(s, sep)
  def joinF(arr: Column, sep: String): Column = concat_ws(sep, arr)
  def replaceF(s: Column, from: String, to: String): Column =
    regexp_replace(s, java.util.regex.Pattern.quote(from), to)
  def regexMatch(s: Column, pattern: String): Column = s.rlike(pattern)

  // math
  def absF(x: Column): Column = abs(x)
  def roundF(x: Column, n: Int): Column = round(x, n)
  def floorF(x: Column): Column = floor(x)
  def ceilF(x: Column): Column = ceil(x)
  def sqrtF(x: Column): Column = sqrt(x)
  def powF(x: Column, y: Column): Column = pow(x, y)
  def logF(x: Column): Column = log(x)
  def expF(x: Column): Column = exp(x)

  // timestamps (UTC session)
  def now(): Column = current_timestamp()
  def yearF(ts: Column): Column = year(ts)
  def monthF(ts: Column): Column = month(ts)
  def dayF(ts: Column): Column = dayofmonth(ts)
  def hourF(ts: Column): Column = hour(ts)
  def minuteF(ts: Column): Column = minute(ts)
  def secondF(ts: Column): Column = second(ts)
  def durationBetweenUs(a: Column, b: Column): Column =
    unix_micros(b) - unix_micros(a)

  // utility
  def coalesceF(cs: Column*): Column = coalesce(cs: _*)
  def uuid(): Column = expr("uuid()")
  def randomF(): Column = rand()
}
