"""DictionaryCompoundWordTokenFilter — reference-vector parity
(TestCompoundWordTokenFilter.cs)."""
from lucenenet_spark.functions.compound import (
    compound_stream,
    dictionary_compound,
)


def _dict(*words):
    return frozenset(w.lower() for w in words)


def test_dumb_compound_words_da():
    dic = _dict("læse", "hest")
    toks = "min veninde som er lidt af en læsehest".split()
    assert compound_stream(toks, dic) == [
        "min", "veninde", "som", "er", "lidt", "af", "en",
        "læsehest", "læse", "hest",
    ]


def test_dumb_compound_partial_and_overlap():
    # Dictionary decompose emits EVERY dictionary substring per start
    # (unlike the hyphenation filter's vector, which is out of scope);
    # onlyLongestMatch collapses the i=0 pair to just "basketball"
    dic = _dict("basketball", "basket", "ball", "kurv")
    assert dictionary_compound("basketballkurv", dic) == [
        "basketballkurv", "basket", "basketball", "ball", "kurv"
    ]
    assert dictionary_compound(
        "basketballkurv", dic, only_longest_match=True
    ) == ["basketballkurv", "basketball", "ball", "kurv"]


def test_dumb_compound_words_se():
    dic = _dict(
        "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
        "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll", "Sko",
        "Vind", "Rute", "Torkare", "Blad",
    )
    toks = (
        "Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
        "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
        "Skomakare Vindrutetorkare Vindrutetorkarblad abba"
    ).split()
    assert compound_stream(toks, dic) == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak", "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral", "makare",
        "gesäll",
        "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad",
        "abba",
    ]


def test_dumb_compound_longest_match():
    dic = _dict(
        "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
        "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare", "Gesäll", "Sko",
        "Vind", "Rute", "Torkare", "Blad", "Fiolsfodral",
    )
    assert dictionary_compound(
        "Basfiolsfodralmakaregesäll", dic, only_longest_match=True
    ) == ["Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral", "fodral",
          "makare", "gesäll"]


def test_token_ending_with_min_length_component():
    dic = _dict("ab", "cd", "ef")
    assert dictionary_compound("abcdef", dic) == ["abcdef", "ab", "cd", "ef"]


def test_short_token_never_decomposes():
    dic = _dict("ab", "cd")
    assert dictionary_compound("abcd", dic) == ["abcd"]  # len 4 < minWordSize


def test_compound_udf(spark):
    from lucenenet_spark.functions.compound import compound_udf

    df = spark.createDataFrame([("basketballkurv abba",)], "text string")
    got = df.select(
        compound_udf(frozenset({"basket", "ball", "kurv"}))("text")
    ).collect()[0][0]
    assert got == ["basketballkurv", "basket", "ball", "kurv", "abba"]
