"""BPE-ish token counting + bigram language ID (datapipe/textstats.py).

The BPE pattern is verified against hand-counted GPT-2-style
pre-tokenizations; the language ID against documents whose dominant
bigrams are unambiguous for one profile.
"""

import pytest
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.datapipe.textstats import (  # noqa: E402
    bpe_token_count,
    language_id_bigram,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_token_count_hand_cases(spark):
    rows = [
        # "Hello world" -> ["Hello", " world"] = 2
        (0, "Hello world"),
        # "it's fine" -> ["it", "'s", " fine"] = 3  (contraction split)
        (1, "it's fine"),
        # "a1b2" -> ["a", "1", "b", "2"] = 4  (letter/digit boundaries)
        (2, "a1b2"),
        # "x -- y!!" -> ["x", " --", " y", "!!"] = 4  (punct runs)
        (3, "x -- y!!"),
        (4, ""),  # empty -> 0
        (5, "   "),  # whitespace only -> 0
        # "2026-08" -> ["2026", "-", "08"] = 3
        (6, "2026-08"),
    ]
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(_docs(spark, rows)).collect()}
    assert got == {0: 2, 1: 3, 2: 4, 3: 4, 4: 0, 5: 0, 6: 3}


def test_bpe_token_count_matches_duckdb(spark):
    """The Spark (Java regex) and DuckDB (RE2) token counts must agree on
    the shared pattern — this is the oracle contract for bpe_token_counts."""
    import duckdb

    from graph_data_science_spark.datapipe.textstats import BPE_TOKEN_RE

    texts = [
        "The quick brown fox, jumped over 12 lazy dogs!",
        "it's we're they'll I'd you've o'clock 'quoted'",
        "mixed1234text--with#various@separators  and   runs",
        "", " ", "\tTabs\tand\nnewlines\n",
        "unicode: café naïve 北京 mañana",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(_docs(spark, rows)).collect()
    }
    con = duckdb.connect()
    pat = BPE_TOKEN_RE.replace("'", "''")
    for i, t in enumerate(texts):
        (want,) = con.execute(
            f"SELECT len(regexp_extract_all(?, '{pat}'))", [t]
        ).fetchone()
        assert got[i] == want, (i, t, got[i], want)


def test_language_id_bigram(spark):
    rows = [
        (0, "the thin thread there then"),  # th-heavy -> en
        (1, "le de les des quelle oulade"),  # le/de/qu -> fr
        (2, "schen durchen eichen schench"),  # sc/ch/en -> de
        (3, "zzz qqq"),  # no profile bigrams -> unk
        (4, ""),  # empty -> unk, score 0
    ]
    got = {
        r["doc_id"]: (r["lang_bigram"], r["lang_score"])
        for r in language_id_bigram(_docs(spark, rows)).collect()
    }
    assert got[0][0] == "en"
    assert got[1][0] == "fr"
    assert got[2][0] == "de"
    assert got[3] == ("unk", 0)
    assert got[4] == ("unk", 0)
    assert all(score >= 0 for _, score in got.values())


def test_gopher_quality_hand_values(spark):
    from graph_data_science_spark.datapipe.textstats import gopher_quality

    good = ("the cat and that dog have fun to be of note with " * 10).strip()
    docs = spark.createDataFrame(
        [
            (1, good),                      # passes everything
            (2, "short text"),              # too few words
            (3, "- a\n- b\n- c\n- d\nok"),  # 80% bullets, few words
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_quality(docs).collect()}
    assert rows[1].gopher_pass and rows[1].word_count == 120
    assert rows[1].stopword_hits == 8
    assert not rows[2].gopher_pass and rows[2].word_count == 2
    assert rows[3].bullet_line_frac == 0.8


def test_repetition_signals_hand_values(spark):
    from graph_data_science_spark.datapipe.textstats import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "x\nx\nx\ny"),       # 2 distinct of 4 lines
            (2, "a b a b a b a b c d"),  # top 2-gram "a b" = 4 of 9
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert rows[1].dup_line_frac == pytest.approx(0.5)
    # chars beyond first occurrence: 2 extra "x" of 4 total line chars
    assert rows[1].dup_line_char_frac == pytest.approx(0.5)
    assert rows[2].top_2gram_char_frac == pytest.approx(4 * 3 / 27)
