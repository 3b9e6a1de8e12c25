"""Text functions and the deterministic HTML extraction invariant."""

from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.functions import text as TX
from entity_resolution_pipeline_v1_spark.operators import extract
from entity_resolution_pipeline_v1_spark.sources import pages as P


def _vals(spark, expr, rows, schema="s string"):
    df = spark.createDataFrame(rows, schema)
    return [r["o"] for r in df.select(expr.alias("o")).collect()]


def test_normalize_name(spark):
    got = _vals(
        spark,
        TX.normalize_name("s"),
        [
            ("Smith, John, 1864-1949",),
            ("Smith, John, approximately 1864-1949",),
            ("Smith, J., b. 1840",),
            ("Smith, B.",),  # bare initial B must survive (not 'born')
        ],
    )
    assert got[0] == "smith john"
    assert got[1] == "smith john"
    assert got[2] == "smith j"
    assert got[3] == "smith b"


def test_tokens_and_shingles(spark):
    assert _vals(spark, TX.tokens("s"), [("Hello,  World!",)]) == [["hello", "world"]]
    got = _vals(spark, TX.char_shingles("s", 3), [("abcd",)])
    assert sorted(got[0]) == ["abc", "bcd"]


def test_counts_and_quality(spark):
    rows = [("The history of the world, part 1.",), ("@@@@ 1234 $$$$",)]
    wc = _vals(spark, TX.whitespace_token_count("s"), rows)
    assert wc[0] == 7
    q = _vals(spark, TX.quality_score("s"), rows)
    assert 0.0 <= q[1] < q[0] <= 1.0


def test_lang_id(spark):
    rows = [
        ("the cat and the dog is on the mat",),
        ("der Hund und die Katze ist von hier",),
        ("le chat est une merveille et la vie",),
        ("这是一个中文句子",),
        ("zzz qqq",),
    ]
    got = _vals(spark, TX.lang_id("s"), rows)
    assert got == ["en", "de", "fr", "zh", "und"]


def test_extraction_byte_identical(spark, corpus):
    """The per-row invariant (BASELINE.json input_hint): extracted text
    == the text column, byte for byte, for every url."""
    pages = P.pages_view(corpus)
    ext = extract.extract_text(pages, mode="main")
    bad = ext.filter(
        (F.col("extracted_text").isNull()) | (F.col("extracted_text") != F.col("text"))
    ).count()
    assert bad == 0


def test_extraction_idempotent_pure():
    html = b"<html><body><main>abc | def</main></body></html>"
    assert extract.main_text_of(html) == "abc | def"
    assert extract.main_text_of(html) == extract.main_text_of(html)
    assert extract.main_text_of(None) is None
    assert extract.generic_text_of(
        b"<html><script>x</script><body><p>Hello  <b>World</b></p></body></html>"
    ) == "Hello World"
