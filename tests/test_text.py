import pytest
from pyspark.sql import Row, functions as F

from docarray_spark.operators import (
    fingerprint_col,
    lang_id,
    text_stats,
    text_to_tensor,
    vocabulary,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(id="a", text="the cat sat on the mat"),
        Row(id="b", text="El perro es un animal y la casa es grande"),
        Row(id="c", text="Der Hund ist ein Tier und das Haus ist nicht klein"),
        Row(id="d", text="one two three two one"),
        Row(id="e", text=""),
    ]
    return spark.createDataFrame(rows)


def test_text_stats(spark, docs):
    out = {r.id: r for r in text_stats(docs).collect()}
    assert out["a"].token_count == 6
    assert out["a"].type_token_ratio == pytest.approx(5 / 6)
    assert out["a"].stopword_ratio == pytest.approx(2 / 6)  # the ×2
    assert out["d"].stopword_ratio == 0.0
    assert out["e"].token_count <= 1  # empty text
    assert 0 <= out["a"].quality_score <= 1


def test_lang_id(spark, docs):
    out = {r.id: r.lang_pred for r in lang_id(docs).collect()}
    assert out["a"] == "en"
    assert out["b"] == "es"
    assert out["c"] == "de"
    # no stopword hits → tie at 0 → alphabetical first
    assert out["d"] == "de"


def test_vocabulary_and_tensor(spark, docs):
    vocab = vocabulary(docs, min_count=2)
    v = {r.token: (r["count"], r.token_id) for r in vocab.collect()}
    # most frequent gets id 2 (0=pad, 1=unk)
    top = min(v.values(), key=lambda t: t[1])
    assert top[1] == 2
    assert v["the"][0] == 2 and v["es"][0] == 2
    assert v["two"][0] == 2 and v["one"][0] == 2
    assert "cat" not in v  # min_count=2

    out = text_to_tensor(docs, vocab, max_len=4)
    got = {r.id: r.tensor for r in out.collect()}
    assert all(len(t) == 4 for t in got.values())
    # 'one two three two' → [one, two, unk, two]
    one_id, two_id = v["one"][1], v["two"][1]
    assert got["d"] == [one_id, two_id, 1, two_id]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("a", "Hello  World"), ("b", "  hello world "), ("c", "hello worlds")],
        "id string, text string",
    )
    fps = {r.id: r.fp for r in df.select("id", fingerprint_col("text").alias("fp")).collect()}
    assert fps["a"] == fps["b"]
    assert fps["a"] != fps["c"]


def test_compression_ratio_detects_repetition(spark):
    from docarray_spark.operators.text import compression_ratio_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "spam " * 200),
         (2, "the quick brown fox jumps over the lazy dog and keeps on "
             "running through fields of completely varied unrepeated text "
             "with ever changing vocabulary items appearing once only"),
         (3, ""), (4, None)],
        "id long, text string",
    )
    out = {r.id: r.ratio for r in df.select(
        "id", compression_ratio_col("text").alias("ratio")).collect()}
    assert out[1] < 0.1           # pure repetition compresses away
    assert out[2] > 0.5           # varied prose doesn't
    assert out[3] is None and out[4] is None


def test_repetition_signals_hand_computed(spark):
    """Gopher §A.1.1 char-mass repetition metrics on hand-computed docs."""
    from docarray_spark.operators import repetition_signals

    df = spark.createDataFrame(
        [
            # doc 1: "ab cd ab cd ef" — words(2,2,2,2,2) total=10 chars.
            # bigrams: "ab cd"×2, "cd ab"×1, "cd ef"×1 → top2 = 2*4/10=0.8
            (1, "ab cd ab cd ef"),
            # doc 2: no within-doc repetition of any n-gram
            (2, "one two three four five"),
            # doc 3: dup lines — "x y\nab\nx y": lines(3) dup "x y"(3 ch)×2
            # → dup_line_char_frac = (2-1)*3 / (3+2+3) = 0.375
            (3, "x y\nab\nx y"),
            # doc 4: a repeated 5-gram — "a b c d e a b c d e":
            # 5-grams: "a b c d e"×2 (+4 singles) mass=5 → dup5=2*5/10=1.0
            (4, "a b c d e a b c d e"),
            # edge cases
            (5, ""), (6, None), (7, "single"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.asDict() for r in repetition_signals(
        df, id_col="doc_id", text_col="text").collect()}
    assert out[1]["top_2gram_char_frac"] == 0.8
    assert out[1]["rep_keep"] is False
    assert out[2]["dup_5gram_char_frac"] == 0.0
    # top n-gram frac counts the most frequent gram even at count 1; all
    # bigrams tie at 1 so the max-mass one wins: "three four" mass 9 / 19
    assert out[2]["top_2gram_char_frac"] == round(9 / 19, 6)
    assert out[3]["dup_line_char_frac"] == 0.375
    assert out[4]["dup_5gram_char_frac"] == 1.0  # clipped at 1.0
    assert out[4]["rep_keep"] is False
    for d in (5, 6):
        assert out[d]["top_2gram_char_frac"] == 0.0
        assert out[d]["dup_line_char_frac"] == 0.0
        assert out[d]["rep_keep"] is True
    # fewer words than n → 0.0 for that n, not an error
    assert out[7]["top_2gram_char_frac"] == 0.0


def test_repetition_signals_tie_break_takes_max_mass(spark):
    from docarray_spark.operators import repetition_signals

    # "aa b aa b cc dd cc dd" — bigrams "aa b"×2 ... wait: grams:
    # (aa b)(b aa)(aa b)(b cc)(cc dd)(dd cc)(cc dd) — "aa b"×2 mass 3,
    # "cc dd"×2 mass 4 → tie on count, pick larger mass: 2*4/14
    df = spark.createDataFrame(
        [(1, "aa b aa b cc dd cc dd")], "doc_id long, text string"
    )
    row = repetition_signals(df, id_col="doc_id", text_col="text").first()
    assert row.top_2gram_char_frac == round(2 * 4 / 14, 6)


def test_repetition_signals_property_vs_naive(spark):
    """Random corpora: the mapInPandas implementation equals an
    independent pure-python recomputation of the pinned definitions."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from docarray_spark.operators import repetition_signals

    words_st = st.lists(
        st.sampled_from(["aa", "bb", "ccc", "d", "ee ff", "\n", "gg\nhh"]),
        min_size=0, max_size=40,
    )

    def naive(text):
        words = [w for w in text.lower().split() if w]
        total = sum(map(len, words))
        out = {}
        for kind, ns, in (("top", (2, 3, 4)), ("dup", (5, 6, 7, 8, 9, 10))):
            for n in ns:
                key = f"{kind}_{n}gram_char_frac"
                if total == 0 or len(words) < n:
                    out[key] = 0.0
                    continue
                c = Counter(tuple(words[i:i + n]) for i in range(len(words) - n + 1))
                if kind == "top":
                    mc = max(c.values())
                    mass = max(sum(map(len, g)) for g, k in c.items() if k == mc)
                    out[key] = mc * mass / total
                else:
                    out[key] = min(1.0, sum(
                        k * sum(map(len, g)) for g, k in c.items() if k >= 2
                    ) / total)
        lines = [l.strip() for l in text.split("\n") if l.strip()]
        lt = sum(map(len, lines))
        lc = Counter(lines)
        out["dup_line_char_frac"] = (
            sum((k - 1) * len(l) for l, k in lc.items() if k >= 2) / lt if lt else 0.0
        )
        # Spark's F.round is HALF_UP on the double's shortest decimal repr
        # (BigDecimal.valueOf); python round() is banker's — emulate Spark
        # so exact .5 ties (e.g. 1/128 → 0.0078125) don't flake
        from decimal import ROUND_HALF_UP, Decimal

        return {
            k: float(Decimal(repr(v)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP))
            for k, v in out.items()
        }

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(docs=st.lists(words_st, min_size=1, max_size=5))
    def check(docs):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.asDict() for r in repetition_signals(
            df, id_col="doc_id", text_col="text").collect()}
        for i, text in rows:
            want = naive(text)
            for k, v in want.items():
                assert got[i][k] == v, (k, text)

    check()


def test_dl_regexp_count_matches_split_size(spark):
    """BM25's _dl now rides regexp_count(trim(text), '\\s+') + 1 so the
    stats aggregation prunes the tokenize (r12 opt pass 2). split with
    limit -1 yields (separator runs + 1) parts for EVERY string —
    edge empties from non-space whitespace included — so the two forms
    must agree on every input, null included."""
    from docarray_spark.operators.text import tokens_col

    cases = ["", " ", "a", " a ", "\ta b\t", "a  b", "\n\na\nb\n",
             "héllo WÖRLD", None, "  \t ",
             "one two  three\tfour\nfive ", "İstanbul I", "\r\n", "a b"]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, text string"
    )
    old = F.size(tokens_col("text"))
    new = (F.regexp_count(F.trim(F.col("text")), F.lit(r"\s+")) + F.lit(1)).cast("int")
    rows = df.select("i", "text", old.alias("o"), new.alias("n")).collect()
    assert all(r.o == r.n for r in rows), [
        (r.text, r.o, r.n) for r in rows if r.o != r.n
    ]
