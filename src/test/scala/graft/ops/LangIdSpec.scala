package graft.ops

import graft.SparkSpecBase

/** q119 — character-trigram language ID over the fixed profile tables.
  * The fixture holds real sentences in the four profiled languages plus
  * a no-signal doc; the classifier must separate them — the
  * discrimination q27's vowel-ratio heuristic cannot provide (French
  * and Spanish share nearly identical vowel ratios).
  */
class LangIdSpec extends SparkSpecBase {

  test("q119: fixture sentences classify to their true language; no-signal text is 'und'") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "The quick brown fox is running over the hills and the meadows of the north", "en", "s", 1L),
      (2L, "Le gouvernement de la France est responsable de la politique et de la justice", "fr", "s", 1L),
      (3L, "Der Wissenschaftler und der Lehrer sprechen durch die Nacht in der alten Stadt", "de", "s", 1L),
      (4L, "El estado de la nacion ha cambiado mucho y los ciudadanos del pais lo han notado", "es", "s", 1L),
      (5L, "zzz qqq xxx", "und", "s", 1L))
    val got = TrainingData.q119LangTrigram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "es", 5L -> "und"), s"got $got")
  }

  test("q119: deterministic tie-break — equal scores resolve in profile order") {
    val dir = tmpDir()
    // "que" is in BOTH the fr and es profiles and nothing else matches:
    // fr_hits = es_hits = 1, every other lang 0 → fr wins (profile order)
    writeDocuments(dir, (1L, "queqque", "x", "s", 1L))
    val row = TrainingData.q119LangTrigram(spark, dir).collect().head
    assert(row.getString(5) == "fr", s"tie must resolve to fr, got ${row.getString(5)}")
  }

  test("q119: hit counting is occurrence-exact, not presence-boolean") {
    val dir = tmpDir()
    // "the" appears 3×: "the" trigram hits 3 times, " th"/"he " also
    // fire — counts must reflect occurrences
    writeDocuments(dir, (1L, "the the the", "en", "s", 1L))
    val row = TrainingData.q119LangTrigram(spark, dir).collect().head
    // en profile: "the"×3, " th"×2 (interior spaces), "he "×2 = 7
    assert(row.getLong(1) == 7L, s"expected 7 en hits, got ${row.getLong(1)}")
    assert(row.getString(5) == "en")
  }
}
