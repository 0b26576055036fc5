package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAlgos

/** Misc string helpers ported from the reference (utils.py:47-59,
  * :538-543).
  */
class MiscHelpersSpec extends AnyFunSuite {

  test("transformString: upper + underscore + NFD accent strip") {
    assert(TextAlgos.transformString("données manquantes") == "DONNEES_MANQUANTES")
    assert(TextAlgos.transformString("Café crème") == "CAFE_CREME")
    assert(TextAlgos.transformString("plain") == "PLAIN")
    assert(TextAlgos.transformString(null) == null)
  }

  test("isBase64") {
    assert(TextAlgos.isBase64(java.util.Base64.getEncoder
      .encodeToString("hello world".getBytes)))
    assert(!TextAlgos.isBase64("not base64!"))
    assert(!TextAlgos.isBase64("abc"))  // bad length
    assert(!TextAlgos.isBase64(""))
    assert(!TextAlgos.isBase64(null))
  }
}
