"""Snowball stemmers for the analyzer slots whose reference Analyzer has no
light-variant alternative: these languages' default (and only) stem filter
at 4.8 is SnowballFilter wrapping a Tartarus-generated stemmer
(Analysis/Da/DanishAnalyzer.cs:124 etc. -> Tartarus/Snowball/Ext/*.cs).

Implementations are written from the PUBLISHED Snowball algorithm
descriptions (snowballstem.org, Porter 2001) — clean Python over the
region model (R1/R2/RV), NOT a translation of the generated cursor
machines; the suffix tables (data) are checked against the reference's
generated Among[] tables so behavior matches the shipped 4.8.1 stemmers,
including quirks the generated code fixes in place.

Region model (snowball manual):
  R1  the region after the first non-vowel following a vowel, or the
      null region at word end if there is no such non-vowel.
  R2  R1's definition applied within R1.
A suffix "in R1" means the suffix lies entirely inside the region:
len(word) - len(suffix) >= r1 start. Languages adjust the start (Danish
clamps R1 to begin no earlier than position 3, via `hop 3`).
"""

from __future__ import annotations


def _region_after(s: str, start: int, vowels: frozenset) -> int:
    """Start of the region after the first non-vowel following a vowel,
    scanning from `start` (the snowball `gopast v; gopast non-v` idiom);
    len(s) when there is no such non-vowel (null region)."""
    n = len(s)
    i = start
    while i < n and s[i] not in vowels:
        i += 1
    while i < n and s[i] in vowels:
        i += 1
    return i + 1 if i < n else n


# -- Danish -------------------------------------------------------------------
# snowball danish.sbl; data checked against Tartarus/Snowball/Ext/
# DanishStemmer.cs a_0/a_1/a_2 + g_v/g_s_ending bitmaps.

_DA_VOWELS = frozenset("aeiouyæåø")
# valid s-endings (g_s_ending bitmap over 97..229)
_DA_S_ENDINGS = frozenset("abcdfghjklmnoprtvyzå")

# a_0, longest first; action 1 = delete, 2 = delete the 's' if preceded by
# a valid s-ending
_DA_MAIN = tuple(
    sorted(
        [
            ("hed", 1), ("ethed", 1), ("ered", 1), ("e", 1), ("erede", 1),
            ("ende", 1), ("erende", 1), ("ene", 1), ("erne", 1), ("ere", 1),
            ("en", 1), ("heden", 1), ("eren", 1), ("er", 1), ("heder", 1),
            ("erer", 1), ("s", 2), ("heds", 1), ("es", 1), ("endes", 1),
            ("erendes", 1), ("enes", 1), ("ernes", 1), ("eres", 1),
            ("ens", 1), ("hedens", 1), ("erens", 1), ("ers", 1), ("ets", 1),
            ("erets", 1), ("et", 1), ("eret", 1),
        ],
        key=lambda e: -len(e[0]),
    )
)

# a_2: action 1 = delete then retry consonant_pair, 2 = løst -> løs
_DA_OTHER = (("elig", 1), ("løst", 2), ("lig", 1), ("els", 1), ("ig", 1))


def _da_p1(s: str) -> int:
    """Danish mark_regions: R1 start, clamped to >= 3 (`hop 3` + the
    p1<x adjustment); words shorter than 3 chars get the null region
    (the hop itself fails and p1 stays at the limit)."""
    n = len(s)
    if n < 3:
        return n
    p1 = _region_after(s, 0, _DA_VOWELS)
    if p1 >= n:
        return n
    return max(p1, 3)


def _da_consonant_pair(s: str, p1: int) -> str:
    """danish consonant_pair: word ends gd/dt/gt/kt with the pair inside
    R1 -> remove the last letter."""
    if len(s) - 2 >= p1 and s[-2:] in ("gd", "dt", "gt", "kt"):
        return s[:-1]
    return s


def danish_stem(token: str) -> str:
    """Snowball Danish (DanishStemmer.cs Stem order: main_suffix ->
    consonant_pair -> other_suffix -> undouble, each optional)."""
    s = token
    p1 = _da_p1(s)
    # main_suffix: longest a_0 suffix lying in R1
    n = len(s)
    for suf, act in _DA_MAIN:
        if n - len(suf) >= p1 and s.endswith(suf):
            if act == 1:
                s = s[: -len(suf)]
            elif s[-2] in _DA_S_ENDINGS:
                s = s[:-1]
            break
    s = _da_consonant_pair(s, p1)
    # other_suffix: the igst -> ig strip is unconditioned on R1
    if s.endswith("igst"):
        s = s[:-2]
    n = len(s)
    for suf, act in _DA_OTHER:
        if n - len(suf) >= p1 and s.endswith(suf):
            if act == 1:
                s = _da_consonant_pair(s[: -len(suf)], p1)
            else:
                s = s[:-1]  # løst -> løs
            break
    # undouble: final double non-vowel with the last char in R1
    if len(s) - 1 >= p1 and s[-1] not in _DA_VOWELS and s[-2] == s[-1]:
        s = s[:-1]
    return s


# -- Dutch --------------------------------------------------------------------
# snowball dutch.sbl; data and cursor semantics checked against
# Tartarus/Snowball/Ext/DutchStemmer.cs (a_0..a_5, g_v/g_v_I/g_v_j) and
# Analysis/Nl/DutchAnalyzer.cs (chain order + DEFAULT_STEM_DICT).

_NL_VOWELS = frozenset("aeiouyè")          # g_v
_NL_VOWELS_I = _NL_VOWELS | {"I"}          # g_v_I
_NL_VOWELS_J = _NL_VOWELS | {"j"}          # g_v_j
_NL_ACCENTS = str.maketrans("áäéëíïóöúü", "aaeeiioouu")

# DutchAnalyzer.cs DEFAULT_STEM_DICT (StemmerOverrideFilter runs before the
# snowball filter; matched tokens are keyword-marked so the stemmer skips)
NL_STEM_OVERRIDES = {
    "fiets": "fiets", "bromfiets": "bromfiets", "ei": "eier", "kind": "kinder",
}


def _nl_mark(s: str) -> str:
    """dutch.sbl prelude after accent folding: initial y -> Y, then a
    left-to-right scan turning i between vowels into I and y after a
    vowel into Y. A replaced char is uppercase (a consonant for every
    later check), and the scan resumes AFTER the replaced char — the
    generated code's reset-to-the-preceding-vowel plus guaranteed
    rematch failure is equivalent to advancing two positions."""
    if s.startswith("y"):
        s = "Y" + s[1:]
    out = list(s)
    n = len(s)
    i = 0
    while i < n - 1:
        if out[i] in _NL_VOWELS:
            nxt = out[i + 1]
            if nxt == "i" and i + 2 < n and out[i + 2] in _NL_VOWELS:
                out[i + 1] = "I"
                i += 2
                continue
            if nxt == "y":
                out[i + 1] = "Y"
                i += 2
                continue
        i += 1
    return "".join(out)


def _nl_regions(m: str) -> tuple:
    """(p1, p2) on the MARKED string (I/Y are consonants). p1 is clamped
    to >= 3 when found; a failed gopast leaves the null region (p1 keeps
    any value already assigned, exactly the generated code's early
    return after setmark p1)."""
    n = len(m)
    i = 0
    while i < n and m[i] not in _NL_VOWELS:
        i += 1
    while i < n and m[i] in _NL_VOWELS:
        i += 1
    if i >= n:
        return n, n
    p1 = max(i + 1, 3)
    j = i + 1
    while j < n and m[j] not in _NL_VOWELS:
        j += 1
    while j < n and m[j] in _NL_VOWELS:
        j += 1
    p2 = j + 1 if j < n else n
    return p1, p2


def _nl_undouble(s: str) -> str:
    """dutch.sbl undouble: remove the final letter of a dd/kk/tt ending."""
    if s[-2:] in ("dd", "kk", "tt"):
        return s[:-1]
    return s


def _nl_en_ending(s: str, length: int, p1: int):
    """en_ending: suffix of `length` in R1, preceded by a non-vowel that
    is not part of a literal 'gem'; delete + undouble. None when the
    conditions fail (the among case then does nothing)."""
    base = s[:-length]
    if len(base) < p1 or not base or base[-1] in _NL_VOWELS:
        return None
    if base.endswith("gem"):
        return None
    return _nl_undouble(base)


def _nl_e_ending(s: str, p1: int):
    """e_ending: final e in R1 preceded by a non-vowel; delete +
    undouble; returns (new_string, e_found)."""
    n = len(s)
    if (
        s.endswith("e") and n - 1 >= p1 and n >= 2
        and s[-2] not in _NL_VOWELS
    ):
        return _nl_undouble(s[:-1]), True
    return s, False


def dutch_stem(token: str) -> str:
    """Snowball Dutch (DutchStemmer.cs Stem: prelude -> mark_regions ->
    standard_suffix steps 1/2/3a/3b/4 -> postlude). Suffix matching is
    longest-match-THEN-conditions (a failed condition does not retry a
    shorter suffix, unlike Danish's region-limited window)."""
    s = _nl_mark(token.translate(_NL_ACCENTS))
    p1, p2 = _nl_regions(s)
    # step 1
    n = len(s)
    if s.endswith("heden"):
        if n - 5 >= p1:
            s = s[:-5] + "heid"
    elif s.endswith("ene"):
        s = _nl_en_ending(s, 3, p1) or s
    elif s.endswith("en"):
        s = _nl_en_ending(s, 2, p1) or s
    elif s.endswith("se"):
        if n - 2 >= p1 and s[-3] not in _NL_VOWELS_J:
            s = s[:-2]
    elif s.endswith("s"):
        if n - 1 >= p1 and n >= 2 and s[-2] not in _NL_VOWELS_J:
            s = s[:-1]
    # step 2
    s, e_found = _nl_e_ending(s, p1)
    # step 3a: heid in R2 not preceded by c, then an en_ending
    n = len(s)
    if s.endswith("heid") and n - 4 >= p2 and (n < 5 or s[-5] != "c"):
        s = s[:-4]
        if s.endswith("en"):
            s = _nl_en_ending(s, 2, p1) or s
    # step 3b: d-suffixes, longest match then conditions
    n = len(s)
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not s.endswith(suf):
            continue
        if suf in ("end", "ing"):
            if n - 3 >= p2:
                s = s[:-3]
                m = len(s)
                if (
                    s.endswith("ig") and m - 2 >= p2
                    and (m < 3 or s[-3] != "e")
                ):
                    s = s[:-2]
                else:
                    s = _nl_undouble(s)
        elif suf == "ig":
            if n - 2 >= p2 and (n < 3 or s[-3] != "e"):
                s = s[:-2]
        elif suf == "lijk":
            if n - 4 >= p2:
                s = s[:-4]
                s, _ = _nl_e_ending(s, p1)
        elif suf == "baar":
            if n - 4 >= p2:
                s = s[:-4]
        elif suf == "bar":
            if n - 3 >= p2 and e_found:
                s = s[:-3]
        break
    # step 4: undouble vowel in C-VV-D (D a consonant other than I)
    if (
        len(s) >= 4 and s[-1] not in _NL_VOWELS_I
        and s[-3:-1] in ("aa", "ee", "oo", "uu")
        and s[-4] not in _NL_VOWELS
    ):
        s = s[:-2] + s[-1]
    # postlude
    return s.replace("I", "i").replace("Y", "y")


def dutch_chain(token: str) -> str:
    """DutchAnalyzer.cs post-stop chain: StemmerOverrideFilter with the
    DEFAULT_STEM_DICT (matches become keywords and skip the stemmer),
    then SnowballFilter(DutchStemmer)."""
    o = NL_STEM_OVERRIDES.get(token)
    if o is not None:
        return o
    return dutch_stem(token)


# -- Armenian -----------------------------------------------------------------
# snowball armenian.sbl (Astghik Mkrtchyan); data checked against
# Tartarus/Snowball/Ext/ArmenianStemmer.cs a_0..a_3 + the g_v bitmap
# (vowels over U+0561..U+0585). Pure suffix deletion: four passes
# (ending -> verb -> adjective -> noun), every match window-limited to
# after the first vowel (setlimit tomark pV), endings additionally in R2.

_HY_VOWELS = frozenset("աեէըիոււօ")

_HY_ADJ = ("երորդ", "ական", "ավետ", "արան", "եկեն", "երեն", "լայն", "ովին",
           "որակ", "որէն", "վուն", "րորդ", "ալի", "ակի", "բար", "գին",
           "կոտ", "պես", "ատ", "եղ", "են", "ին", "իվ")
_HY_VERB = ("ացրինք", "վեցինք", "ալուց", "ացանք", "ացինք", "ացնալ", "ացվել",
            "ացրեց", "ացրին", "ացրիր", "ացրիք", "ելուց", "եցինք", "եցնել",
            "եցվել", "կոտել", "վեցին", "վեցիր", "վեցիք", "ալիս", "ալով",
            "ալու", "անալ", "ատել", "ացան", "ացավ", "ացար", "ացաք", "ացին",
            "ացիր", "ացիք", "ացրի", "ելիս", "ելով", "ելու", "ենալ", "եցավ",
            "եցար", "եցին", "եցիր", "եցիք", "ոտել", "վեցի", "վում", "ցանք",
            "ցնել", "անք", "ացա", "ացի", "եցա", "եցի", "ըալ", "ըել", "նել",
            "ում", "չել", "ված", "վել", "տել", "ցան", "ցաք", "ալ", "ան",
            "ավ", "ար", "աց", "աք", "ել", "եց", "վե", "ա")
_HY_NOUN = ("ություն", "մունք", "ալիք", "անակ", "անիք", "անօց", "ավոր",
            "արան", "եղէն", "յուն", "ուհի", "ույթ", "ույք", "ունք", "ուստ",
            "ստան", "վածք", "ածո", "արք", "գար", "ենք", "իչք", "յակ",
            "ոնք", "որդ", "ուկ", "ուս", "չեք", "պան", "վոր", "ակ", "ան",
            "իլ", "իկ", "իչ", "իք", "ոց", "ու", "ցի", "ք")
_HY_ENDING = ("ությանդ", "ությանը", "ությանն", "ությանս", "ներում",
              "ության", "անում", "երում", "ներին", "ներից", "ներով",
              "վանից", "անով", "երին", "երից", "երով", "ներդ", "ները",
              "ների", "ներն", "ոջից", "վանդ", "վանը", "վանս", "ամբ",
              "անդ", "անը", "երդ", "երը", "երի", "երն", "ներ", "ոջդ",
              "ոջը", "ոջս", "ուդ", "ուն", "ուց", "վան", "վից", "վով",
              "ցից", "ան", "եր", "ին", "ից", "ոջ", "ով", "ոց", "սա",
              "վա", "վի", "դ", "ը", "ի", "ն", "ց")


def _hy_apply(s: str, pV: int, table: tuple, p2: int | None) -> str:
    """One rule pass: the longest table suffix fitting the [pV:] window;
    when p2 is given (the ending pass) the R2 check runs AFTER selection
    — a match outside R2 fails the pass without retrying shorter."""
    m = len(s)
    for suf in table:
        if m - len(suf) >= pV and s.endswith(suf):
            if p2 is not None and m - len(suf) < p2:
                return s
            return s[: -len(suf)]
    return s


def armenian_stem(token: str) -> str:
    """Snowball Armenian (ArmenianStemmer.cs Stem: setlimit tomark pV
    around do(ending) do(verb) do(adjective) do(noun))."""
    s = token
    n = len(s)
    i = 0
    while i < n and s[i] not in _HY_VOWELS:
        i += 1
    if i >= n:
        return s
    pV = i + 1
    p1 = _region_after(s, 0, _HY_VOWELS)
    p2 = _region_after(s, p1, _HY_VOWELS)
    s = _hy_apply(s, pV, _HY_ENDING, p2)
    s = _hy_apply(s, pV, _HY_VERB, None)
    s = _hy_apply(s, pV, _HY_ADJ, None)
    s = _hy_apply(s, pV, _HY_NOUN, None)
    return s
