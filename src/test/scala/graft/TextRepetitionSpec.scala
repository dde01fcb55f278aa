package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{size => arrSize, _}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Edge cases of the per-row repetition signals (p19): the sf tables
  * contain no single-token or fully-repeated documents, so the array
  * boundary behavior is pinned here against hand-computed values.
  */
class TextRepetitionSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("textrep-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def statsOf(text: String): (Long, Long, Long, Long) = {
    val s = spark
    import s.implicits._
    val toks = TextOps.tokens(col("text"))
    val row = Seq(text).toDF("text")
      .select(toks.as("tok"))
      .select(
        arrSize(col("tok")).cast("long"),
        TextOps.maxMultiplicity(col("tok")),
        TextOps.maxMultiplicity(TextOps.ngrams(col("tok"), 2)),
        (arrSize(TextOps.ngrams(col("tok"), 3))
          - arrSize(array_distinct(TextOps.ngrams(col("tok"), 3)))).cast("long"))
      .head()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  it should "handle single-token and empty documents" in {
    statsOf("hello") shouldBe ((1L, 1L, 0L, 0L)) // no bigrams, no trigrams
    statsOf("") shouldBe ((1L, 1L, 0L, 0L)) // split('') = ['']
  }

  it should "count multiplicities and duplicated trigrams on repeated text" in {
    // "a b a b a b": tokens a×3 b×3; bigrams [a b, b a, a b, b a, a b]
    // → top bigram 3; trigrams [a b a, b a b, a b a, b a b] → 4 total,
    // 2 distinct → 2 duplicated occurrences
    statsOf("a b a b a b") shouldBe ((6L, 3L, 3L, 2L))
    // fully repeated single word
    statsOf("x x x x") shouldBe ((4L, 4L, 3L, 1L))
  }

  it should "report no repetition on an all-distinct document" in {
    statsOf("q w e r t y") shouldBe ((6L, 1L, 1L, 0L))
  }
}
