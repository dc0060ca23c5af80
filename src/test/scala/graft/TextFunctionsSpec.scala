package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.model.Link

class TextFunctionsSpec extends AnyFunSuite {

  test("extractLinks: basic, piped, special, fragment, newline") {
    val text = "a [[Spark|the engine]] b [[Scala]] c [[File:x.png|img]] " +
      "d [[#frag]] e [[bad\nlink]] f [[]] g [[x|]]"
    assert(extractLinks(text) ==
      Seq(Link("the engine", "Spark"), Link("Scala", "Scala")))
    assert(extractLinks(null).isEmpty)
    assert(extractLinks("no links").isEmpty)
    assert(extractLinks("unclosed [[x").isEmpty)
  }

  test("extractLinksWithContext: offsets and windows") {
    val text = "0123456789[[T|a]]post"
    val out = extractLinksWithContext(text, window = 4)
    assert(out.length == 1)
    assert(out.head.target == "T" && out.head.anchor == "a")
    assert(out.head.offset == 10)
    assert(out.head.pre == "6789" && out.head.post == "post")
  }

  test("extractReferences matches whitespace-terminated http URLs") {
    assert(extractReferences("see http://a.com/x rest http://b.io end") ==
      Seq("http://a.com/x", "http://b.io"))
    // no trailing whitespace → no match (reference regex semantics)
    assert(extractReferences("tail http://c.com").isEmpty)
  }

  test("extractTemplates: blacklist and arg stripping") {
    val text = "{{Infobox person|name=x}} {{cite web|url=y}} {{Portal}} " +
      "{{DEFAULTSORT:Z}} {{Good one}}"
    assert(extractTemplates(text) == Seq("Infobox person", "Good one"))
  }

  test("plainText strips markup to clean text") {
    assert(plainText("'''Bold''' [[link|word]] <ref>x</ref> {{tmpl}} &amp; ok") ==
      "Bold word & ok")
    assert(plainText("nested {{a {{b}} c}} done") == "nested done")
    assert(plainText("[[File:x.png|thumb]] kept [[plain]]") == "kept plain")
    assert(plainText(null) == "")
    // arbitrary nesting depth strips to a fixpoint (was: two fixed passes)
    assert(plainText("deep {{a {{b {{c {{d}} e}} f}} g}} done") == "deep done")
    // wikitables drop like bliki's converter drops them
    assert(plainText("before {| class=\"wikitable\"\n|-\n| cell {{t}} x\n|} after")
      == "before after")
    // unbalanced braces fall through as literal text instead of looping
    assert(plainText("stray {{ brace") == "stray {{ brace")
  }

  test("normalizeTitle") {
    assert(normalizeTitle("foo bar#sec") == "Foo_bar")
    assert(normalizeTitle("a&b=c") == "A")
    assert(normalizeTitle("\"quoted title\"") == "Quoted_title")
    assert(normalizeTitle("héllo wörld") == "Héllo_wörld")
    assert(normalizeTitle("") == "")
    assert(normalizeTitle(null) == null)
  }

  test("freebaseEncode escapes non [A-Za-z0-9_-]") {
    assert(freebaseEncode("en/src0") == "en$002Fsrc0")
    assert(freebaseEncode("A_b-9") == "A_b-9")
    assert(freebaseEncode("a b") == "a$0020b")
  }

  test("cutLast") {
    assert(cutLast("abcdef", 2) == "abcd")
    assert(cutLast("ab", 5) == "")
    assert(cutLast(null, 1) == "")
  }

  test("extractDomain: PSL subset") {
    assert(extractDomain("http://www.bbc.co.uk/news") == "bbc\tco.uk")
    assert(extractDomain("https://example.com/x?y") == "example\tcom")
    assert(extractDomain("ftp://a.b.example.org") == "example\torg")
    assert(extractDomain("not a url") == null)
    assert(extractDomain(null) == null)
  }

  test("langId heuristic") {
    assert(langId("the cat is on the mat and it is lazy") == "en")
    assert(langId("der hund ist nicht auf der matte und das ist gut") == "de")
    assert(langId("中文文本的示例内容") == "zh")
    assert(langId("") == "und")
    assert(langId("zzz qqq") == "und")
  }
}
