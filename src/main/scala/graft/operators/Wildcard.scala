package graft.operators

/** File-glob wildcard translation (SURVEY §2.3 F10) — `*`/`?` patterns to
  * SQL LIKE (pushdown path) and to an anchored regex (in-memory path).
  * Reference: `Operators/LikeOperator.cs:38-95`,
  * `src/Smartstore/Utilities/Wildcard.cs`.
  *
  * LIKE translation: `*`→`%`, `?`→`_`; pre-existing `%`/`_` (and the escape
  * char itself) are escaped with `/` so they match literally — the same
  * escape character the reference passes to `EF.Functions.Like`.
  */
object Wildcard {

  def toLikePattern(wildcard: String): String = {
    val sb = new StringBuilder(wildcard.length + 8)
    wildcard.foreach {
      case '*' => sb += '%'
      case '?' => sb += '_'
      case '%' => sb ++= "/%"
      case '_' => sb ++= "/_"
      case '/' => sb ++= "//"
      case c => sb += c
    }
    sb.result()
  }

  def toRegex(wildcard: String): String = {
    val sb = new StringBuilder("^")
    wildcard.foreach {
      case '*' => sb ++= ".*"
      case '?' => sb += '.'
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb += '\\' += c
      case c => sb += c
    }
    sb.append('$').result()
  }

  def hasWildcard(s: String): Boolean =
    s.indexOf('*') >= 0 || s.indexOf('?') >= 0

  /** In-memory match, case-insensitive like the reference's `Wildcard`
    * regex path (`WildcardTests.cs`). */
  def matches(wildcard: String, value: String): Boolean =
    java.util.regex.Pattern
      .compile(toRegex(wildcard), java.util.regex.Pattern.CASE_INSENSITIVE)
      .matcher(value).matches()
}
