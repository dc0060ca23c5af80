package graft

/** Minimal JSON string escaping shared by the measurement mains.
  *
  * Bench and ScaleProbe each emit hand-assembled one-line JSON records;
  * before r18, ScaleProbe escaped error messages with a narrow
  * quote/backslash/CR/LF regex, so a tab or other control character in
  * a Spark stack summary produced an invalid record (r17 ADVICE). One
  * escaper, covering every char < 0x20, used by both.
  */
object JsonUtil {
  /** `s` as a quoted JSON string literal, all control chars escaped. */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
