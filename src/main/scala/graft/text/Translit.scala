package graft.text

import java.text.Normalizer

/** ASCII transliteration, the JVM stand-in for the reference's `unidecode`
  * call (`/root/reference/thisishappening/utils/tweet_utils.py:405-419`) per
  * SURVEY §7.4.3.
  *
  * Coverage: Latin scripts via NFD + combining-mark strip + special-case table,
  * common typographic punctuation (smart quotes, dashes, ellipsis), Greek and
  * Cyrillic via small transliteration tables. CJK and other scripts map to ""
  * (documented divergence: `unidecode` romanizes them; outside golden-test
  * coverage the engine drops them instead — tokens of another script never
  * merge with Latin token counts either way).
  */
object Translit {

  private val special: Map[Char, String] = Map(
    'æ' -> "ae", 'Æ' -> "AE", 'ø' -> "o", 'Ø' -> "O", 'ß' -> "ss",
    'đ' -> "d", 'Đ' -> "D", 'ð' -> "d", 'Ð' -> "D", 'þ' -> "th", 'Þ' -> "Th",
    'ł' -> "l", 'Ł' -> "L", 'œ' -> "oe", 'Œ' -> "OE", 'ı' -> "i",
    '‘' -> "'", '’' -> "'", '‚' -> ",", '‛' -> "'",
    '“' -> "\"", '”' -> "\"", '„' -> "\"",
    '–' -> "-", '—' -> "--", '―' -> "--", '−' -> "-",
    '…' -> "...", ' ' -> " ", '·' -> "*", '•' -> "*",
    '«' -> "<<", '»' -> ">>", '‹' -> "<", '›' -> ">",
    '¡' -> "!", '¿' -> "?", '×' -> "x", '÷' -> "/",
    '′' -> "'", '″' -> "\"", '°' -> "deg",
  )

  private val greek: Map[Char, String] = Map(
    'α' -> "a", 'β' -> "b", 'γ' -> "g", 'δ' -> "d", 'ε' -> "e", 'ζ' -> "z",
    'η' -> "e", 'θ' -> "th", 'ι' -> "i", 'κ' -> "k", 'λ' -> "l", 'μ' -> "m",
    'ν' -> "n", 'ξ' -> "x", 'ο' -> "o", 'π' -> "p", 'ρ' -> "r", 'σ' -> "s",
    'ς' -> "s", 'τ' -> "t", 'υ' -> "u", 'φ' -> "ph", 'χ' -> "ch", 'ψ' -> "ps",
    'ω' -> "o",
  )

  private val cyrillic: Map[Char, String] = Map(
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d", 'е' -> "e",
    'ё' -> "e", 'ж' -> "zh", 'з' -> "z", 'и' -> "i", 'й' -> "i", 'к' -> "k",
    'л' -> "l", 'м' -> "m", 'н' -> "n", 'о' -> "o", 'п' -> "p", 'р' -> "r",
    'с' -> "s", 'т' -> "t", 'у' -> "u", 'ф' -> "f", 'х' -> "kh", 'ц' -> "ts",
    'ч' -> "ch", 'ш' -> "sh", 'щ' -> "shch", 'ъ' -> "", 'ы' -> "y", 'ь' -> "",
    'э' -> "e", 'ю' -> "iu", 'я' -> "ia",
  )

  /** Transliterate one codepoint to ASCII; "" when unmapped. */
  def decodeChar(cp: Int): String = {
    if (cp < 0x80) return new String(Character.toChars(cp))
    val ch = if (Character.isBmpCodePoint(cp)) cp.toChar else return ""
    special.get(ch).foreach(return _)
    greek.get(Character.toLowerCase(ch)).foreach { g =>
      return if (Character.isUpperCase(ch)) g.capitalize else g
    }
    cyrillic.get(Character.toLowerCase(ch)).foreach { c =>
      return if (Character.isUpperCase(ch)) c.capitalize else c
    }
    // Latin with diacritics: NFD-decompose, keep the ASCII base
    val d = Normalizer.normalize(ch.toString, Normalizer.Form.NFD)
    val base = d.filter(c => c < 0x80 && !Character.isISOControl(c))
    base
  }

  def decode(text: String): String = {
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      sb.append(decodeChar(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }
}
