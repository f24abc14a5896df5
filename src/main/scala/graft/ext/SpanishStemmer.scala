package graft.ext

/** Snowball Spanish stemmer — a pure-JVM implementation of the published
  * algorithm (M.F. Porter, snowballstem.org/algorithms/spanish/stemmer.html),
  * closing the last declared §2.8 F17 divergence: the reference indexes its
  * search surface with `to_tsvector('spanish', ...)` + a GIN index
  * (reference: database/migrations/001_initial_schema.sql:87-88,128-129),
  * whose lexeme normalization is exactly this stemmer.
  *
  * Faithfulness notes (the algorithm has three distinct matching regimes,
  * and conflating them is the classic porting bug):
  *  - Step 1 (standard suffixes) matches the longest suffix ANYWHERE and
  *    then tests its R1/R2 condition; a failed condition fails the whole
  *    step (no backtracking to a shorter suffix).
  *  - Steps 0/2a/2b (pronouns, verb suffixes) match inside `setlimit
  *    tomark pV` — i.e. only suffixes lying entirely within RV are
  *    candidates, so a longer out-of-RV suffix does NOT shadow a shorter
  *    in-RV one.
  *  - R1/R2/RV are absolute character positions computed ONCE on the
  *    input word (Snowball's p1/p2/pV markers); later replacements only
  *    ever shorten the tail, so the markers stay valid.
  *
  * Scale: a per-token pure function with no allocation beyond the result
  * string — called from typed flatMap pipelines (stemmedPostings), it runs
  * map-side at scan speed like the rest of TextAnalysis.
  */
object SpanishStemmer {

  private val vowels = "aeiouáéíóúü"
  @inline private def isVowel(c: Char): Boolean = vowels.indexOf(c.toInt) >= 0

  /** Start of the region after the first non-vowel following a vowel,
    * scanning from `from`; end of word when no such pair exists. */
  private def regionAfter(w: String, from: Int): Int = {
    var i = from
    while (i + 1 < w.length && !(isVowel(w(i)) && !isVowel(w(i + 1)))) i += 1
    if (i + 1 < w.length) i + 2 else w.length
  }

  /** RV per the spec: second letter consonant → after the next vowel;
    * first two letters vowels → after the next consonant; consonant-vowel
    * → after the third letter. (Examples from the spec: macho→"ho",
    * oliva→"va", trabajo→"bajo", áureo→"eo".) */
  private def rvStart(w: String): Int =
    if (w.length < 3) w.length
    else if (!isVowel(w(1))) {
      var i = 2
      while (i < w.length && !isVowel(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else if (isVowel(w(0))) {
      var i = 2
      while (i < w.length && isVowel(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else 3

  // Step 0: attached pronouns, longest-first.
  private val pronouns = Seq(
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo")

  // Step 1 suffix groups (longest-first within the combined search).
  private val s1Delete = Seq( // delete if in R2
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
  private val s1Adora = Seq( // delete if in R2; then a preceding ic if in R2
    "aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
    "ancia", "ador", "ante")
  private val s1Logia = Seq("logías", "logía")     // -> "log" if in R2
  private val s1Ucion = Seq("uciones", "ución")    // -> "u" if in R2
  private val s1Encia = Seq("encias", "encia")     // -> "ente" if in R2
  private val s1Idad  = Seq("idades", "idad")      // delete if R2; then abil/ic/iv
  private val s1Iva   = Seq("ivas", "ivos", "iva", "ivo") // delete if R2; then at

  private val step1All: Seq[String] =
    (s1Delete ++ s1Adora ++ s1Logia ++ s1Ucion ++ s1Encia ++
      Seq("amente", "mente") ++ s1Idad ++ s1Iva).sortBy(-_.length)

  // Step 2a: verb suffixes beginning y (delete if in RV and preceded by u).
  private val step2a = Seq(
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "yó")

  // Step 2b group 1: delete if in RV; then a trailing gu loses its u.
  private val step2bGu = Seq("emos", "éis", "en", "es")
  // Step 2b group 2: delete if in RV.
  private val step2bPlain = Seq(
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
    "aríais", "aseis", "ieseis", "asteis", "isteis", "eríais", "iríais",
    "áramos", "ábamos", "ásemos", "arían", "arías", "aréis", "erían",
    "erías", "eréis", "irían", "irías", "iréis", "ieran", "iesen",
    "ieron", "iendo", "ieras", "ieses", "abais", "arais", "ierais",
    "íamos", "aremos", "eremos", "iremos",
    "arán", "arás", "aría", "erán", "erás", "ería", "irán", "irás",
    "iría", "iera", "iese", "aste", "iste", "aban", "aran", "asen",
    "aron", "ando", "abas", "adas", "idas", "aras", "ases", "íais",
    "ados", "idos", "amos", "imos", "ará", "aré", "erá", "eré", "irá",
    "iré", "aba", "ada", "ida", "ara", "ase", "ían", "ado", "ido",
    "ías", "áis", "ía", "ad", "ed", "id", "an", "ió", "ar", "er",
    "ir", "as", "ís")
  private val step2bAll: Seq[String] = (step2bGu ++ step2bPlain).sortBy(-_.length)

  private def removeAccents(w: String): String =
    w.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }

  /** Stem one lowercase word. Non-letter input passes through unchanged
    * modulo accent removal (numbers, empty strings are their own stems). */
  def stem(word: String): String = {
    if (word == null || word.length < 2) return removeAccents(Option(word).getOrElse(""))
    var w = word
    val r1 = regionAfter(w, 0)
    val r2 = regionAfter(w, r1)
    val rv = rvStart(w)

    def start(s: String): Int = w.length - s.length
    def endsIn(s: String, region: Int): Boolean = w.endsWith(s) && start(s) >= region

    // ---- Step 0: attached pronoun ----
    pronouns.find(w.endsWith).foreach { p =>
      val base = w.dropRight(p.length)
      def baseEndsInRv(pat: String): Boolean =
        base.endsWith(pat) && base.length - pat.length >= rv
      // RV-limited longest match over the verb patterns; accented forms
      // lose their accent when the pronoun drops (haciéndola → haciendo).
      if (baseEndsInRv("iéndo")) w = base.dropRight(5) + "iendo"
      else if (baseEndsInRv("yendo")) {
        if (base.length >= 6 && base.charAt(base.length - 6) == 'u') w = base
      }
      else if (baseEndsInRv("iendo")) w = base
      else if (baseEndsInRv("ándo")) w = base.dropRight(4) + "ando"
      else if (baseEndsInRv("ando")) w = base
      else if (baseEndsInRv("ár")) w = base.dropRight(2) + "ar"
      else if (baseEndsInRv("ér")) w = base.dropRight(2) + "er"
      else if (baseEndsInRv("ír")) w = base.dropRight(2) + "ir"
      else if (baseEndsInRv("ar") || baseEndsInRv("er") || baseEndsInRv("ir"))
        w = base
    }

    // ---- Step 1: standard suffix removal (longest match, then condition) ----
    val before1 = w
    step1All.find(w.endsWith).foreach { s =>
      if (s == "amente") {
        // delete if in R1; then iv (then at), else one of os/ic/ad, in R2
        if (endsIn(s, r1)) {
          w = w.dropRight(6)
          if (endsIn("iv", r2)) {
            w = w.dropRight(2)
            if (endsIn("at", r2)) w = w.dropRight(2)
          } else Seq("os", "ic", "ad").find(p => endsIn(p, r2))
            .foreach(p => w = w.dropRight(p.length))
        }
      } else if (s == "mente") {
        if (endsIn(s, r2)) {
          w = w.dropRight(5)
          Seq("ante", "able", "ible").find(p => endsIn(p, r2))
            .foreach(p => w = w.dropRight(p.length))
        }
      } else if (s1Logia.contains(s)) {
        if (endsIn(s, r2)) w = w.dropRight(s.length) + "log"
      } else if (s1Ucion.contains(s)) {
        if (endsIn(s, r2)) w = w.dropRight(s.length) + "u"
      } else if (s1Encia.contains(s)) {
        if (endsIn(s, r2)) w = w.dropRight(s.length) + "ente"
      } else if (s1Adora.contains(s)) {
        if (endsIn(s, r2)) {
          w = w.dropRight(s.length)
          if (endsIn("ic", r2)) w = w.dropRight(2)
        }
      } else if (s1Idad.contains(s)) {
        if (endsIn(s, r2)) {
          w = w.dropRight(s.length)
          Seq("abil", "ic", "iv").find(p => endsIn(p, r2))
            .foreach(p => w = w.dropRight(p.length))
        }
      } else if (s1Iva.contains(s)) {
        if (endsIn(s, r2)) {
          w = w.dropRight(s.length)
          if (endsIn("at", r2)) w = w.dropRight(2)
        }
      } else { // plain delete-if-R2 group
        if (endsIn(s, r2)) w = w.dropRight(s.length)
      }
    }
    val removed1 = w.length != before1.length

    // ---- Step 2: verb suffixes (only when step 1 removed nothing) ----
    if (!removed1) {
      // 2a: y-suffixes, RV-limited match, preceded by u (u may sit before RV)
      val hit2a = step2a.filter(s => endsIn(s, rv)).sortBy(-_.length).headOption
      val removed2a = hit2a.exists { s =>
        val ok = start(s) >= 1 && w.charAt(start(s) - 1) == 'u'
        if (ok) w = w.dropRight(s.length)
        ok
      }
      if (!removed2a) {
        // 2b: RV-limited longest match across both groups
        step2bAll.filter(s => endsIn(s, rv)).sortBy(-_.length).headOption.foreach { s =>
          w = w.dropRight(s.length)
          if (step2bGu.contains(s) && w.endsWith("gu")) w = w.dropRight(1)
        }
      }
    }

    // ---- Step 3: residual suffix ----
    Seq("os", "a", "o", "á", "í", "ó", "e", "é").find(w.endsWith).foreach { s =>
      if (s == "e" || s == "é") {
        if (start(s) >= rv) {
          w = w.dropRight(1)
          // a trailing gu loses the u only when that u is itself in RV
          if (w.endsWith("gu") && w.length - 1 >= rv) w = w.dropRight(1)
        }
      } else if (start(s) >= rv) w = w.dropRight(s.length)
    }

    removeAccents(w)
  }
}
