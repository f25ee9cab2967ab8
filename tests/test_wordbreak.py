"""WordBreakSpellChecker — reference-vector parity over the reference's
own corpus (TestWordBreakSpellChecker.cs: English spellings of 900..1111
with '-'->' ' and ',' removed, plus three planted docs)."""
import pytest

from lucenenet_spark.operators.wordbreak import (
    MODE_ALWAYS,
    MODE_WHEN_NOT_IN_INDEX,
    SORT_MAX_FREQ,
    WordBreakSpellChecker,
)

ONES = [
    "", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
        "eighty", "ninety"]


def int_to_english(n: int) -> str:
    """English.Int32ToEnglish for 900..1111, with the test's '-'->' ' and
    ','-removal already applied."""
    parts = []
    if n >= 1000:
        parts.append(ONES[n // 1000] + " thousand")
        n %= 1000
    if n >= 100:
        parts.append(ONES[n // 100] + " hundred")
        n %= 100
    if n >= 20:
        t = TENS[n // 10]
        if n % 10:
            t += " " + ONES[n % 10]
        parts.append(t)
    elif n > 0:
        parts.append(ONES[n])
    return " ".join(parts)


class FakeSearcher:
    """df probe over the reference corpus (whitespace + lowercase)."""

    def __init__(self):
        docs = [int_to_english(i) for i in range(900, 1112)]
        docs.append("thou hast sand betwixt thy toes")
        docs.append("hundredeight eightyeight yeight")
        docs.append("tres y cinco")
        self.df = {}
        for d in docs:
            for t in set(d.split()):
                self.df[t] = self.df.get(t, 0) + 1

    def doc_freqs(self, keys):
        return {k: self.df.get(k[1], 0) for k in keys}


@pytest.fixture(scope="module")
def wb():
    return WordBreakSpellChecker(FakeSearcher(), field="numbers")


def test_break_ninetynine(wb):
    sw = wb.suggest_word_breaks(
        "ninetynine", 5, MODE_WHEN_NOT_IN_INDEX, SORT_MAX_FREQ
    )
    assert len(sw) == 1 and len(sw[0]) == 2
    assert sw[0][0].string == "ninety" and sw[0][1].string == "nine"
    assert sw[0][0].score == 1 and sw[0][1].score == 1


def test_break_onethousand_maxchanges(wb):
    sw = wb.suggest_word_breaks("onethousand", 2)
    assert len(sw) == 1 and [w.string for w in sw[0]] == ["one", "thousand"]

    wb.max_changes = 2
    try:
        sw = wb.suggest_word_breaks("onethousand", 1)
        assert len(sw) == 1 and len(sw[0]) == 2

        wb.min_suggestion_frequency = 2
        sw = wb.suggest_word_breaks("onethousand", 2)
        assert len(sw) == 1 and len(sw[0]) == 2

        wb.min_suggestion_frequency = 1
        sw = wb.suggest_word_breaks("onethousand", 2)
        assert len(sw) == 2
        assert [w.string for w in sw[0]] == ["one", "thousand"]
        assert [w.score for w in sw[0]] == [1, 1]
        assert sw[0][1].freq > 1 and sw[0][0].freq > sw[0][1].freq
        assert [w.string for w in sw[1]] == ["one", "thou", "sand"]
        assert [w.score for w in sw[1]] == [2, 2, 2]
        assert sw[1][0].freq > 1
        assert sw[1][1].freq == 1 and sw[1][2].freq == 1
    finally:
        wb.max_changes = 1
        wb.min_suggestion_frequency = 1


def test_break_deep_recursion(wb):
    word = "onethousandonehundredeleven"
    try:
        wb.max_changes = 3
        assert wb.suggest_word_breaks(word, 5) == []
        wb.max_changes = 4
        sw = wb.suggest_word_breaks(word, 5)
        assert len(sw) == 1 and len(sw[0]) == 5
        wb.max_changes = 5
        sw = wb.suggest_word_breaks(word, 5)
        assert len(sw) == 2
        assert len(sw[0]) == 5 and sw[0][1].string == "thousand"
        assert len(sw[1]) == 6
        assert sw[1][1].string == "thou" and sw[1][2].string == "sand"
    finally:
        wb.max_changes = 1


def test_break_single_codepoint(wb):
    assert wb.suggest_word_breaks("\U00029079", 5) == []


def test_break_in_index_suppressed(wb):
    assert wb.suggest_word_breaks("thousand", 5, MODE_WHEN_NOT_IN_INDEX) == []


def test_combine_always(wb):
    terms = ["one", "hun", "dred", "eight", "y", "eight"]
    try:
        wb.max_changes = 3
        wb.max_combine_word_length = 20
        wb.min_suggestion_frequency = 1
        cs = wb.suggest_word_combinations(terms, 10, MODE_ALWAYS)
        assert len(cs) == 5
        assert cs[0][0].string == "hundred" and cs[0][1] == [1, 2]
        assert cs[0][0].score == 1
        assert cs[1][0].string == "eighty" and cs[1][1] == [3, 4]
        assert cs[2][0].string == "yeight" and cs[2][1] == [4, 5]
        two_merge = {(c[0].string, tuple(c[1])) for c in cs[3:]}
        assert two_merge == {
            ("hundredeight", (1, 2, 3)),
            ("eightyeight", (3, 4, 5)),
        }
        assert all(c[0].score == 2 for c in cs[3:])

        cs = wb.suggest_word_combinations(terms, 5, MODE_WHEN_NOT_IN_INDEX)
        assert len(cs) == 2
        assert cs[0][0].string == "hundred" and cs[0][1] == [1, 2]
        assert cs[0][0].score == 1
        assert cs[1][0].string == "hundredeight" and cs[1][1] == [1, 2, 3]
        assert cs[1][0].score == 2
    finally:
        wb.max_changes = 1


def test_wordbreak_on_real_searcher(searcher):
    # integration: corpus terms 'popcorn' etc. via the cached stats scan
    wb = WordBreakSpellChecker(searcher)
    sw = wb.suggest_word_breaks("popcornword7", 5)
    assert sw and [w.string for w in sw[0]] == ["popcorn", "word7"]
    cs = wb.suggest_word_combinations(["popc", "orn"], 5)
    assert cs and cs[0][0].string == "popcorn"
