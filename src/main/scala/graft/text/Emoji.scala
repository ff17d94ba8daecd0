package graft.text

import scala.util.matching.Regex

/** Emoji detection for the text pipeline (SURVEY §2.9 F8).
  *
  * The reference uses the `emoji` PyPI package's data tables
  * (`/root/reference/thisishappening/utils/tweet_utils.py:322-330,492-523`);
  * no JVM twin ships in this environment, so detection is re-derived from the
  * public Unicode emoji code ranges (UTS #51). Sequences (ZWJ chains, skin-tone
  * modifiers, VS-16) are matched as single units, matching
  * `emoji.distinct_emoji_list`'s maximal-munch behavior for the golden fixture
  * (`/root/reference/tests/test_event.py`).
  */
object Emoji {

  /** Unicode ranges whose members count as emoji bases (UTS #51 data, curated
    * to the ranges the `emoji` package recognizes).
    */
  private val baseRanges: Array[(Int, Int)] = Array(
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), // © ®
    (0x203C, 0x203C), (0x2049, 0x2049), // ‼ ⁉
    (0x2122, 0x2122), (0x2139, 0x2139), // ™ ℹ
    (0x2194, 0x21AA),                   // arrows
    (0x231A, 0x231B), (0x2328, 0x2328), // watch, keyboard
    (0x23CF, 0x23FA),                   // media controls
    (0x24C2, 0x24C2),                   // Ⓜ
    (0x25AA, 0x25AB), (0x25B6, 0x25B6), (0x25C0, 0x25C0), (0x25FB, 0x25FE),
    (0x2600, 0x27BF),                   // misc symbols + dingbats (⚾ ✔ ❤ ♂ ♀ …)
    (0x2934, 0x2935), (0x2B00, 0x2B55),
    (0x3030, 0x3030), (0x303D, 0x303D), (0x3297, 0x3297), (0x3299, 0x3299),
    (0x1F000, 0x1F02F), (0x1F0A0, 0x1F0FF), // mahjong, cards
    (0x1F100, 0x1F1FF),                     // enclosed + regional indicators
    (0x1F200, 0x1F2FF),
    (0x1F300, 0x1F5FF), (0x1F600, 0x1F64F), (0x1F680, 0x1F6FF),
    (0x1F700, 0x1F77F), (0x1F780, 0x1F7FF), (0x1F800, 0x1F8FF),
    (0x1F900, 0x1F9FF), (0x1FA00, 0x1FAFF),
  )

  private val SkinToneLo = 0x1F3FB
  private val SkinToneHi = 0x1F3FF
  val Zwj                = 0x200D
  val Vs16               = 0xFE0F

  def isEmojiBase(cp: Int): Boolean = {
    var i = 0
    while (i < baseRanges.length) {
      val (lo, hi) = baseRanges(i)
      if (cp >= lo && cp <= hi) return true
      i += 1
    }
    false
  }

  def isSkinTone(cp: Int): Boolean = cp >= SkinToneLo && cp <= SkinToneHi

  /** Single-codepoint emoji test, the analog of `emoji.is_emoji(letter)` on
    * one char: bases and skin-tone modifiers qualify; ZWJ/VS-16 alone do not
    * (the reference keeps those via its UNICODE_KEEP set instead).
    */
  def isEmojiChar(cp: Int): Boolean = isEmojiBase(cp) || isSkinTone(cp)

  /** One full emoji sequence: base, optional modifiers, optional ZWJ chain. */
  val sequenceRegex: Regex = {
    val base = "[\\x{00A9}\\x{00AE}\\x{203C}\\x{2049}\\x{2122}\\x{2139}" +
      "\\x{2194}-\\x{21AA}\\x{231A}-\\x{231B}\\x{2328}\\x{23CF}-\\x{23FA}" +
      "\\x{24C2}\\x{25AA}-\\x{25AB}\\x{25B6}\\x{25C0}\\x{25FB}-\\x{25FE}" +
      "\\x{2600}-\\x{27BF}\\x{2934}-\\x{2935}\\x{2B00}-\\x{2B55}" +
      "\\x{3030}\\x{303D}\\x{3297}\\x{3299}" +
      "\\x{1F000}-\\x{1F02F}\\x{1F0A0}-\\x{1F0FF}\\x{1F100}-\\x{1F2FF}" +
      "\\x{1F300}-\\x{1F6FF}\\x{1F700}-\\x{1F8FF}\\x{1F900}-\\x{1FAFF}]"
    val mods = "(?:[\\x{1F3FB}-\\x{1F3FF}\\x{FE0F}])*"
    val unit = base + mods
    (unit + "(?:\\x{200D}" + unit + ")*").r
  }

  /** All emoji sequence occurrences, in order. */
  def findAll(text: String): List[String] = sequenceRegex.findAllIn(text).toList

  /** `emoji.emoji_count` analog: number of emoji sequences in the text. */
  def emojiCount(text: String): Int = sequenceRegex.findAllIn(text).size

  /** Whether the whole token is (or contains) emoji. */
  def containsEmoji(text: String): Boolean = sequenceRegex.findFirstIn(text).isDefined
}
