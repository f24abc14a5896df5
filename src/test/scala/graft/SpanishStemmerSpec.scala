package graft

import graft.ext.SpanishStemmer.stem
import org.scalatest.funsuite.AnyFunSuite

/** Golden pairs hand-traced from the published Snowball Spanish algorithm
  * (snowballstem.org/algorithms/spanish/stemmer.html) BEFORE the
  * implementation ran — each covers a distinct branch: R1/R2/RV region
  * arithmetic, step 0 pronoun+accent restoration, every step-1 suffix
  * group, step-2a y-verbs, step-2b verb suffixes with the gu rule,
  * step-3 residuals, and the final accent removal. */
class SpanishStemmerSpec extends AnyFunSuite {

  private val golden = Seq(
    // step 1: standard suffix groups, R2-conditioned
    "generosamente" -> "gener",      // amente in R1, then os in R2
    "rápidamente" -> "rapid",        // amente in R1, no further deletion
    "fácilmente" -> "facil",         // mente in R2
    "comunicación" -> "comun",       // ación in R2, then ic in R2
    "trabajadores" -> "trabaj",      // adores in R2
    "importantes" -> "import",       // antes in R2
    "importancia" -> "import",       // ancia in R2 (conflates with antes)
    "esperanza" -> "esper",          // anza in R2
    "nacionalismo" -> "nacional",    // ismo in R2
    "agradable" -> "agrad",          // able in R2
    "poderoso" -> "poder",           // oso in R2
    "conocimiento" -> "conoc",       // imiento in R2
    "presidencia" -> "president",    // encia -> ente, then step-3 e
    "actividades" -> "activ",        // idades in R2; iv NOT in R2, stays
    "capacidades" -> "capac",        // idades in R2, no ic/abil/iv before
    "operativa" -> "oper",           // iva in R2, then at in R2
    "universidades" -> "univers",    // idades deep in R2
    "estudiantes" -> "estudi",       // antes in R2
    // step 1 longest-match FAILS its R2 test -> whole step fails, no
    // backtracking; verb/residual suffixes then apply
    "lógica" -> "logic",             // ica matched but not in R2; step-3 a
    "única" -> "unic",               // same, with accented first vowel
    "famosos" -> "famos",            // osos not in R2; step-3 os
    // the algorithm's own asymmetry: step-2b strips the verb-homograph
    // "as", and step 3 (which ALWAYS runs) then strips the residual os —
    // so feminine plurals in -osas lose more than -osos forms do
    "famosas" -> "fam",              // osas not in R2; 2b as, then step-3 os
    "hermosas" -> "herm",            // same double strip
    "movimiento" -> "movimient",     // imiento not in R2; step-3 o
    "movimientos" -> "movimient",    // imientos not in R2; step-3 os
    "biología" -> "biolog",          // logía not in R2; step-2b ía
    "tecnología" -> "tecnolog",      // logía not in R2; 2b ía converges anyway
    "solución" -> "solucion",        // ución not in R2; nothing else fires
    "soluciones" -> "solucion",      // ución not in R2; step-2b es (conflates)
    "pescadores" -> "pescador",      // adores not in R2; step-2b es
    // step 0: attached pronouns with accent restoration
    "haciéndola" -> "hac",           // la after iéndo in RV -> haciendo -> 2b
    "quedándose" -> "qued",          // se after ándo in RV -> quedando -> 2b
    // step 2b: verb suffixes in RV
    "trabajando" -> "trabaj",        // ando
    "hablando" -> "habl",            // ando
    "hablaría" -> "habl",            // aría
    "hablaremos" -> "habl",          // aremos (longest beats emos)
    "habló" -> "habl",               // step-3 ó
    "siguiendo" -> "sigu",           // iendo (plain group: u kept)
    "llegues" -> "lleg",             // es, then trailing gu loses its u
    "librería" -> "libr",            // ería
    "economía" -> "econom",          // ía
    "creciendo" -> "crec",           // iendo
    "comida" -> "com",               // ida
    "avanzada" -> "avanz",           // ada
    "canciones" -> "cancion",        // es (aciones does NOT match nciones)
    "corazones" -> "corazon",        // es
    "amigas" -> "amig",              // as (verb-suffix list, conflates amigos)
    // step 2a: y-verbs require a preceding u
    "creyendo" -> "creyend",         // yendo in RV but no u -> only step-3 o
    // step 3: residual suffixes in RV
    "canción" -> "cancion",          // no suffix; accents removed at the end
    "corazón" -> "corazon",
    "amigos" -> "amig",              // os
    "niños" -> "niñ",                // os in RV; ñ survives
    "años" -> "años",                // os NOT in RV (RV starts at the s)
    "guerra" -> "guerr",             // a
    "música" -> "music",             // ica not in R2; step-3 a
    "historia" -> "histori",         // a
    "antiguo" -> "antigu",           // o (gu rule applies only to e/é)
    "café" -> "caf",                 // é in RV
    "montañas" -> "montañ",          // 2b as
    "montañosas" -> "montañ")        // osas in R2 (conflates with montañas)

  test("golden pairs hand-traced from the published algorithm") {
    val bad = golden.collect {
      case (w, want) if stem(w) != want => s"$w: got ${stem(w)}, want $want"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  // NOTE deliberately no idempotence test: Snowball is not idempotent
  // (stem("poderoso") = "poder", but stem("poder") = "pod" — "er" is a
  // verb suffix in RV). The index and the query needle must therefore
  // stem the SURFACE form exactly once each — which stemmedPostings and
  // searchAllStems both do.

  test("degenerate inputs pass through") {
    assert(stem("") == "")
    assert(stem(null) == "")
    assert(stem("a") == "a")
    assert(stem("é") == "e")   // accent removal still applies
    assert(stem("42") == "42")
    assert(stem("la") == "la") // pronoun word itself is not truncated
    assert(stem("los") == "los")
  }

  test("fuzz: never throws, never lengthens, deterministic on arbitrary input") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnñopqrstuvwxyzáéíóúü0123456789 .&[]#-"
    (0 until 2000).foreach { _ =>
      val w = Seq.fill(rnd.nextInt(16))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val s1 = stem(w)  // must not throw for ANY input, valid word or not
      assert(s1.length <= w.length, s"'$w' grew to '$s1'")
      assert(s1 == stem(w), s"nondeterministic for '$w'")
    }
  }

  test("stemmed postings and BM25 tolerate null ids/texts (chunkWindows contract)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((Some(1L), Some("canciones famosas")),
        (None, Some("huérfano")), (Some(3L), None))
      .toDF("doc_id", "text")
    val postings = graft.ext.TextAnalysis.stemmedPostings(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // only the well-formed row posts; null id/text rows emit nothing
    assert(postings == Set((1L, "cancion"), (1L, "fam")))
    val ranked = graft.ext.Ranking.bm25TopKStemmed(docs, "text", "doc_id",
      Seq("canción"), 5).collect()
    assert(ranked.map(_.getLong(0)).toSeq == Seq(1L))
    graft.ops.TransientCache.releaseAll()
  }

  test("RV region examples from the spec") {
    // macho->"ho", oliva->"va", trabajo->"bajo", áureo->"eo": observable
    // through step-3 behavior (suffix in/out of RV)
    assert(stem("macho") == "mach")    // o at index 4 >= rv 3
    assert(stem("oliva") == "oliv")    // a at index 4 >= rv 3
    assert(stem("trabajo") == "trabaj")
    assert(stem("áureo") == "aure")    // o at index 4 >= rv 4
  }
}
