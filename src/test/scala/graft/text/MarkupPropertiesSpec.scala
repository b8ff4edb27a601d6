package graft.text

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the q189 markup-extraction rule chain: random
  * prose decorated with random SUBSETS and ORDERINGS of every
  * real-crawl hazard the chain claims to handle (comments carrying
  * markup and unclosed scripts, CDATA with `-->` and tags inside,
  * mixed-case machine blocks, boilerplate elements, quoted `>` in
  * attribute values, benign inline tags wrapping whole words) must
  * extract back to EXACTLY the prose. The fixtures pin specific
  * orderings; this spec sweeps hazard combinations where a rule-order
  * interaction (e.g. a block rule seeing into a comment, a tag strip
  * truncating at a quoted `>`) would leak markup into the corpus or
  * swallow prose out of it.
  */
class MarkupPropertiesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(613L + i)))

  private val genWord: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  /** Hazards that must vanish COMPLETELY, whatever their order. */
  private val hazards: Seq[String] = Seq(
    "<!-- a comment with <p>markup</p> inside -->",
    "<!-- an UNCLOSED <script> in a comment -->",
    "<![CDATA[raw > cdata <b>tags</b> and --> inside]]>",
    "<script>\nif (a < b) { run(); }\n</script>",
    "<SCRIPT type=\"text/javascript\">x()</SCRIPT>",
    "<style>p { margin: 0; }</style>",
    "<STYLE>.c{}</STYLE>",
    "<nav>home | about</nav>",
    "<NAV>menu</NAV>",
    "<footer>copyright</footer>",
    "<img alt=\"width > height\" src=\"/x.png\">",
    "<a href=\"/p?q=1\" title='it''s > fine'></a>",
    "<br>", "<hr/>", "<div class=\"a b\" data-k='v'></div>")

  private val genDoc: Gen[(String, String)] = for {
    words <- Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, genWord))
    // wrap some whole words in benign inline tags (strip must leave
    // the word, never split it)
    wrapped <- Gen.sequence[List[String], String](words.map(w =>
      Gen.oneOf(w, s"<b>$w</b>", s"<em class=\"x\">$w</em>", w)))
    pre <- Gen.someOf(hazards).map(_.toList)
    post <- Gen.someOf(hazards).map(_.toList)
    mid <- Gen.someOf(hazards.take(6)).map(_.toList)
  } yield {
    val k = wrapped.length / 2
    val body = pre.mkString + "<p>" + wrapped.take(k).mkString(" ") +
      "</p>" + mid.mkString + "<p>" + wrapped.drop(k).mkString(" ") +
      "</p>" + post.mkString
    val html = "<html><head><title>t</title></head><body>" + body +
      "</body></html>"
    (html, words.mkString(" "))
  }

  test("random hazard subsets and orderings extract back to exactly " +
    "the prose — nothing leaks in, nothing is swallowed") {
    import spark.implicits._
    val docs = samples(genDoc, 120)
    val got = docs.map(_._1).toDF("h")
      .select(TextQueries.markupExtract(col("h")).as("c"))
      .collect().map(_.getString(0))
    docs.zip(got).zipWithIndex.foreach { case (((html, want), g), i) =>
      assert(g == want,
        s"doc $i: '$g' != '$want'\nhtml: ${html.take(400)}")
    }
  }
}
