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


# -- Catalan ------------------------------------------------------------------
# snowball catalan.sbl (Israel Olalla / Jordi Mas); data + action mapping
# checked against Tartarus/Snowball/Ext/CatalanStemmer.cs a_0..a_4 and the
# g_v bitmap (a e i o u à á è é í ï ò ó ú ü). Rule entries are
# (suffix, region, replacement): region 1 = R1, 2 = R2; matching is
# longest-match-THEN-region (fail-no-retry). Stem order: attached_pronoun
# -> (standard_suffix OR verb_suffix) -> residual_suffix -> cleaning
# (the forward accent/middle-dot fold).

_CA_VOWELS = frozenset("aeiouàáèéíïòóúü")
_CA_CLEAN = str.maketrans("àáèéìíïòóúü·", "aaeeiiioouu.")

# CatalanAnalyzer.cs DEFAULT_ARTICLES (ElisionFilter, case-insensitive)
CATALAN_ARTICLES = frozenset("dlmnst")

_CA_PRON = (
    ("selas", 1, ""), ("selos", 1, ""), ("-les", 1, ""), ("-nos", 1, ""),
    ("sela", 1, ""), ("selo", 1, ""), ("'hi", 1, ""), ("'ho", 1, ""),
    ("'ls", 1, ""), ("'ns", 1, ""), ("-la", 1, ""), ("-li", 1, ""),
    ("-ls", 1, ""), ("-me", 1, ""), ("-ns", 1, ""), ("-te", 1, ""),
    ("-us", 1, ""), ("ens", 1, ""), ("las", 1, ""), ("les", 1, ""),
    ("los", 1, ""), ("nos", 1, ""), ("vos", 1, ""), ("'l", 1, ""),
    ("'m", 1, ""), ("'n", 1, ""), ("'s", 1, ""), ("'t", 1, ""),
    ("-m", 1, ""), ("-n", 1, ""), ("hi", 1, ""), ("ho", 1, ""),
    ("la", 1, ""), ("le", 1, ""), ("li", 1, ""), ("lo", 1, ""),
    ("me", 1, ""), ("se", 1, ""), ("us", 1, ""),
)
_CA_STD = (
    ("allengües", 1, ""), ("ativitats", 1, ""), ("quíssimes", 1, "c"),
    ("ativitat", 1, ""), ("bilitats", 1, ""), ("ialismes", 1, ""),
    ("ialistes", 1, ""), ("ionistes", 1, ""), ("lógiques", 2, "log"),
    ("quíssima", 1, "c"), ("quíssims", 1, "c"), ("atòries", 1, ""),
    ("bilitat", 1, ""), ("ialisme", 1, ""), ("ialista", 1, ""),
    ("ionisme", 1, ""), ("ionista", 1, ""), ("isament", 1, ""),
    ("ivitats", 1, ""), ("quíssim", 1, "c"), ("íssimes", 1, ""),
    ("acions", 2, ""), ("aments", 1, ""), ("ancies", 1, ""),
    ("atives", 1, ""), ("atòria", 1, ""), ("encies", 1, ""),
    ("formes", 1, ""), ("idores", 1, ""), ("ificar", 1, ""),
    ("ivisme", 1, ""), ("ivitat", 1, ""), ("logies", 2, "log"),
    ("logíes", 2, "log"), ("lógica", 2, "log"), ("lógics", 2, "log"),
    ("ències", 1, ""), ("íssima", 1, ""), ("íssims", 1, ""),
    ("ables", 1, ""), ("adora", 1, ""), ("adors", 1, ""), ("adura", 1, ""),
    ("ament", 1, ""), ("ancia", 1, ""), ("asses", 1, ""), ("assos", 1, ""),
    ("atius", 1, ""), ("ativa", 1, ""), ("cions", 1, ""), ("doras", 1, ""),
    ("dores", 1, ""), ("dures", 1, ""), ("encia", 1, ""), ("eries", 1, ""),
    ("ibles", 1, ""), ("ictes", 1, ""), ("idors", 1, ""), ("inies", 1, ""),
    ("iques", 2, "ic"), ("ismes", 1, ""), ("issem", 1, ""),
    ("isseu", 1, ""), ("issos", 1, ""), ("istes", 1, ""), ("itats", 1, ""),
    ("itzar", 1, ""), ("logia", 2, "log"), ("logis", 2, "log"),
    ("logía", 2, "log"), ("ments", 1, ""), ("sfera", 1, ""),
    ("toris", 1, ""), ("trius", 1, ""), ("àries", 1, ""), ("ència", 1, ""),
    ("ìssem", 1, ""), ("ìsseu", 1, ""), ("ìssin", 1, ""), ("ícies", 1, ""),
    ("íinia", 1, ""), ("ínies", 1, ""), ("íssem", 1, ""), ("ísseu", 1, ""),
    ("íssim", 1, ""), ("íssiu", 1, ""), ("ístic", 1, ""), ("ívola", 1, ""),
    ("ïtats", 1, ""), ("able", 1, ""), ("ació", 1, ""), ("ades", 2, ""),
    ("aire", 1, ""), ("alla", 1, ""), ("amen", 1, ""), ("ants", 1, ""),
    ("aris", 1, ""), ("assa", 1, ""), ("atge", 1, ""), ("atiu", 1, ""),
    ("bles", 1, ""), ("dora", 1, ""), ("dors", 1, ""), ("egar", 1, ""),
    ("ejar", 1, ""), ("ella", 1, ""), ("ells", 1, ""), ("enca", 1, ""),
    ("ents", 1, ""), ("eres", 1, ""), ("eria", 1, ""), ("eses", 1, ""),
    ("esos", 1, ""), ("essa", 1, ""), ("ible", 1, ""), ("icis", 1, ""),
    ("icte", 1, ""), ("ient", 1, ""), ("imes", 1, ""), ("ines", 1, ""),
    ("inia", 1, ""), ("ions", 1, ""), ("isam", 1, ""), ("isme", 1, ""),
    ("issa", 1, ""), ("ista", 1, ""), ("iste", 1, ""), ("itar", 1, ""),
    ("itat", 1, ""), ("ites", 1, ""), ("ives", 1, ""), ("logi", 2, "log"),
    ("ment", 1, ""), ("nces", 1, ""), ("ores", 1, ""), ("oses", 1, ""),
    ("osos", 1, ""), ("otes", 1, ""), ("tori", 1, ""), ("triu", 1, ""),
    ("ària", 1, ""), ("ícia", 1, ""), ("ícis", 1, ""), ("ívol", 1, ""),
    ("ïtat", 1, ""), ("ada", 2, ""), ("all", 1, ""), ("als", 1, ""),
    ("ana", 1, ""), ("ant", 1, ""), ("ari", 1, ""), ("ats", 1, ""),
    ("ble", 1, ""), ("ció", 1, ""), ("dor", 1, ""), ("dur", 1, ""),
    ("dís", 1, ""), ("ell", 1, ""), ("enc", 1, ""), ("ent", 1, ""),
    ("era", 1, ""), ("ers", 1, ""), ("esa", 1, ""), ("esc", 1, ""),
    ("eta", 1, ""), ("ets", 1, ""), ("fer", 1, ""), ("ica", 2, "ic"),
    ("ici", 1, ""), ("ics", 2, "ic"), ("ima", 1, ""), ("ims", 1, ""),
    ("ina", 1, ""), ("ita", 1, ""), ("ius", 1, ""), ("iva", 1, ""),
    ("nça", 1, ""), ("ora", 1, ""), ("ors", 1, ""), ("osa", 1, ""),
    ("ota", 1, ""), ("ots", 1, ""), ("uds", 1, ""), ("uts", 1, ""),
    ("íci", 1, ""), ("al", 1, ""), ("ar", 1, ""), ("et", 1, ""),
    ("ic", 2, "ic"), ("il", 1, ""), ("ió", 1, ""), ("ls", 1, ""),
    ("or", 1, ""), ("ot", 1, ""), ("ud", 1, ""), ("ès", 1, ""),
    ("és", 1, ""), ("ís", 1, ""), ("ós", 1, ""), ("ó", 1, ""),
)
_CA_VERB = (
    ("aríamos", 1, ""), ("eresseu", 1, ""), ("eríamos", 1, ""),
    ("iríamos", 1, ""), ("iéramos", 1, ""), ("iésemos", 1, ""),
    ("adores", 1, ""), ("aremos", 1, ""), ("aríais", 1, ""),
    ("asteis", 1, ""), ("eremos", 1, ""), ("eríais", 1, ""),
    ("esquen", 1, ""), ("esques", 1, ""), ("esquin", 1, ""),
    ("esquis", 1, ""), ("ierais", 1, ""), ("ieseis", 1, ""),
    ("iremos", 1, ""), ("iríais", 1, ""), ("isquen", 1, ""),
    ("isteis", 1, ""), ("ábamos", 1, ""), ("áramos", 1, ""),
    ("ásemos", 1, ""), ("ïsquen", 1, ""), ("ïsques", 1, ""),
    ("abais", 1, ""), ("adora", 1, ""), ("adors", 1, ""), ("arais", 1, ""),
    ("arian", 1, ""), ("arien", 1, ""), ("aries", 1, ""), ("aréis", 1, ""),
    ("arían", 1, ""), ("arías", 1, ""), ("aríem", 1, ""), ("aríeu", 1, ""),
    ("aseis", 1, ""), ("assen", 1, ""), ("asses", 1, ""), ("asseu", 1, ""),
    ("assim", 1, ""), ("assin", 1, ""), ("assis", 1, ""), ("assiu", 1, ""),
    ("atges", 1, ""), ("eixen", 1, ""), ("eixer", 1, ""), ("eixes", 1, ""),
    ("eixin", 1, ""), ("eixis", 1, ""), ("erass", 1, ""), ("eréis", 1, ""),
    ("erían", 1, ""), ("erías", 1, ""), ("esqui", 1, ""), ("essen", 1, ""),
    ("esses", 1, ""), ("esseu", 1, ""), ("essim", 1, ""), ("essin", 1, ""),
    ("essis", 1, ""), ("iendo", 1, ""), ("ieran", 1, ""), ("ieras", 1, ""),
    ("ieron", 1, ""), ("iesen", 1, ""), ("ieses", 1, ""), ("iguem", 1, ""),
    ("igueu", 1, ""), ("irien", 1, ""), ("iries", 1, ""), ("iréis", 1, ""),
    ("irìem", 1, ""), ("irìeu", 1, ""), ("irían", 1, ""), ("irías", 1, ""),
    ("iríem", 1, ""), ("iríeu", 1, ""), ("issen", 1, ""), ("isses", 1, ""),
    ("issim", 1, ""), ("issin", 1, ""), ("issis", 1, ""), ("issiu", 1, ""),
    ("itzeu", 1, ""), ("itzis", 1, ""), ("àssem", 1, ""), ("àsseu", 1, ""),
    ("àssim", 1, ""), ("àssiu", 1, ""), ("èssim", 1, ""), ("èssiu", 1, ""),
    ("éssem", 1, ""), ("éssen", 1, ""), ("ésseu", 1, ""), ("éssim", 1, ""),
    ("éssiu", 1, ""), ("íamos", 1, ""), ("íssim", 1, ""), ("íssiu", 1, ""),
    ("ïguem", 1, ""), ("ïgueu", 1, ""), ("ïssen", 1, ""), ("ïsses", 1, ""),
    ("ïssin", 1, ""), ("ïssis", 1, ""), ("aban", 1, ""), ("abas", 1, ""),
    ("adas", 1, ""), ("ades", 1, ""), ("ador", 1, ""), ("ados", 1, ""),
    ("amos", 1, ""), ("ando", 2, ""), ("aran", 1, ""), ("aras", 1, ""),
    ("arem", 1, ""), ("aren", 1, ""), ("ares", 1, ""), ("areu", 1, ""),
    ("aria", 1, ""), ("aron", 1, ""), ("aràs", 1, ""), ("arán", 1, ""),
    ("arás", 1, ""), ("arés", 1, ""), ("aría", 1, ""), ("asen", 1, ""),
    ("ases", 1, ""), ("aste", 1, ""), ("avem", 1, ""), ("aven", 1, ""),
    ("aves", 1, ""), ("eixi", 1, ""), ("eixo", 1, ""), ("ents", 1, ""),
    ("erau", 1, ""), ("eren", 1, ""), ("erán", 1, ""), ("erás", 1, ""),
    ("ería", 1, ""), ("esca", 1, ""), ("idas", 1, ""), ("ides", 1, ""),
    ("idos", 1, ""), ("iera", 1, ""), ("iese", 1, ""), ("imos", 1, ""),
    ("ineu", 1, ""), ("inin", 1, ""), ("inis", 1, ""), ("iran", 1, ""),
    ("irem", 1, ""), ("iren", 1, ""), ("ires", 1, ""), ("ireu", 1, ""),
    ("iria", 1, ""), ("iràs", 1, ""), ("irán", 1, ""), ("irás", 1, ""),
    ("iría", 1, ""), ("isca", 1, ""), ("isin", 1, ""), ("isis", 1, ""),
    ("iste", 1, ""), ("itza", 1, ""), ("itzi", 1, ""), ("itzo", 1, ""),
    ("itzà", 1, ""), ("ixen", 1, ""), ("ixes", 1, ""), ("ques", 1, ""),
    ("tzar", 1, ""), ("udes", 1, ""), ("àrem", 1, ""), ("àren", 1, ""),
    ("àreu", 1, ""), ("àvem", 1, ""), ("àveu", 1, ""), ("ávem", 1, ""),
    ("áveu", 1, ""), ("íais", 1, ""), ("írem", 1, ""), ("íreu", 1, ""),
    ("ïdes", 1, ""), ("ïren", 1, ""), ("ïres", 1, ""), ("ïsca", 1, ""),
    ("ïxen", 1, ""), ("ïxes", 1, ""), ("aba", 1, ""), ("ada", 1, ""),
    ("ado", 1, ""), ("ams", 1, ""), ("ant", 1, ""), ("ara", 1, ""),
    ("arà", 1, ""), ("ará", 1, ""), ("aré", 1, ""), ("ase", 1, ""),
    ("ass", 1, ""), ("ats", 1, ""), ("ava", 1, ""), ("dre", 1, ""),
    ("eix", 1, ""), ("ent", 1, ""), ("erá", 1, ""), ("eré", 1, ""),
    ("ess", 1, ""), ("ida", 1, ""), ("ido", 1, ""), ("ids", 1, ""),
    ("ien", 1, ""), ("ies", 1, ""), ("ieu", 1, ""), ("ini", 1, ""),
    ("int", 1, ""), ("ira", 1, ""), ("irà", 1, ""), ("irá", 1, ""),
    ("irè", 1, ""), ("iré", 1, ""), ("isc", 1, ""), ("its", 1, ""),
    ("itz", 1, ""), ("ixa", 1, ""), ("ixo", 1, ""), ("iïn", 1, ""),
    ("iïs", 1, ""), ("sin", 1, ""), ("sis", 1, ""), ("uda", 1, ""),
    ("áis", 1, ""), ("ìeu", 1, ""), ("ían", 1, ""), ("ías", 1, ""),
    ("íem", 1, ""), ("íeu", 1, ""), ("ïda", 1, ""), ("ïen", 1, ""),
    ("ïes", 1, ""), ("ïra", 1, ""), ("ïsc", 1, ""), ("ïxo", 1, ""),
    ("ad", 1, ""), ("am", 1, ""), ("an", 1, ""), ("ar", 1, ""),
    ("as", 1, ""), ("at", 1, ""), ("au", 1, ""), ("ed", 1, ""),
    ("em", 1, ""), ("en", 1, ""), ("er", 1, ""), ("es", 1, ""),
    ("ia", 1, ""), ("id", 1, ""), ("ie", 1, ""), ("ii", 1, ""),
    ("in", 1, ""), ("io", 1, ""), ("ir", 1, ""), ("it", 1, ""),
    ("ix", 1, ""), ("ià", 1, ""), ("iï", 1, ""), ("ió", 1, ""),
    ("re", 1, ""), ("ut", 1, ""), ("às", 1, ""), ("és", 1, ""),
    ("ía", 1, ""), ("ís", 1, ""), ("ïa", 1, ""), ("ïm", 1, ""),
    ("ït", 1, ""), ("ïu", 1, ""), ("ïx", 1, ""), ("í", 1, ""),
)
_CA_RES = (
    ("iqu", 1, "ic"), ("itz", 1, ""), ("eu", 1, ""), ("ir", 1, ""),
    ("is", 1, ""), ("it", 1, ""), ("iu", 1, ""), ("os", 1, ""),
    ("ïn", 1, ""), ("ïs", 1, ""), ("a", 1, ""), ("e", 1, ""), ("i", 1, ""),
    ("o", 1, ""), ("s", 1, ""), ("à", 1, ""), ("á", 1, ""), ("é", 1, ""),
    ("ì", 1, ""), ("í", 1, ""), ("ï", 1, ""), ("ó", 1, ""),
)


def _ca_rule(s: str, table: tuple, p1: int, p2: int):
    """One catalan rule: longest table suffix of s, then the region
    check; returns the rewritten string, or None when the rule fails
    (no match, or the matched suffix lies outside its region)."""
    m = len(s)
    for suf, reg, repl in table:
        if s.endswith(suf):
            pos = m - len(suf)
            if pos < (p1 if reg == 1 else p2):
                return None
            return s[:pos] + repl
    return None


def catalan_stem(token: str) -> str:
    """Snowball Catalan (CatalanStemmer.cs Stem: mark_regions backwards
    do(attached_pronoun) do(standard_suffix or verb_suffix)
    do(residual_suffix) forwards do(cleaning))."""
    s = token
    p1 = _region_after(s, 0, _CA_VOWELS)
    p2 = _region_after(s, p1, _CA_VOWELS)
    s = _ca_rule(s, _CA_PRON, p1, p2) or s
    s2 = _ca_rule(s, _CA_STD, p1, p2)
    if s2 is None:
        s2 = _ca_rule(s, _CA_VERB, p1, p2)
    if s2 is not None:
        s = s2
    s = _ca_rule(s, _CA_RES, p1, p2) or s
    return s.translate(_CA_CLEAN)


# -- Romanian -----------------------------------------------------------------
# snowball romanian.sbl; data checked against Tartarus/Snowball/Ext/
# RomanianStemmer.cs a_0..a_5 + the g_v bitmap (a e i o u â î ă).
# Prelude marks u/i between vowels as U/I (consonants thereafter);
# pV is the Spanish-style RV; step_0 and the combo/standard suffixes
# check their region AFTER among selection (fail-no-retry), while the
# verb pass window-limits the among match itself (setlimit tomark pV).

_RO_VOWELS = frozenset("aeiouâîă")  # a e i o u â î ă

# a_1 (step_0), longest-first; repl None = delete; "ile" carries the
# not-preceded-by-"ab" condition (case 5)
_RO_STEP0 = (
    ("iilor", "i"), ("aţia", "aţi"), ("aţie", "aţi"),
    ("ului", None), ("iile", "i"), ("atei", "at"), ("elor", "e"),
    ("ilor", "i"),
    ("aua", "a"), ("iua", "i"), ("ele", "e"), ("ile", "i"), ("iei", "i"),
    ("ii", "i"), ("ul", None), ("ea", "e"),
)

# a_2 (combo_suffix), longest-first, replacement per case 1..6
_RO_COMBO = tuple(
    sorted(
        [(s, "abil") for s in
         ("abilitate", "abilitati", "abilităi", "abilităţi")]
        + [("ibilitate", "ibil")]
        + [(s, "iv") for s in
           ("ivitate", "ivitati", "ivităi", "ivităţi")]
        + [(s, "ic") for s in
           ("icala", "iciva", "icale", "icali", "icitate", "icitati",
            "icive", "icivi", "icităi", "icităţi", "ical",
            "icator", "icatori", "iciv", "icală", "icivă")]
        + [(s, "at") for s in
           ("ativa", "ative", "ativi", "ativă", "aţiune",
            "atoare", "ator", "atori", "ătoare", "ător",
            "ători", "ativ")]
        + [(s, "it") for s in
           ("itiva", "itive", "itivi", "itivă", "iţiune",
            "itoare", "itor", "itori", "itiv")],
        key=lambda e: -len(e[0]),
    )
)

# a_3 (standard_suffix): action 1 delete, 2 = ţiune/ţiuni -> t, 3 -> ist
_RO_STD = tuple(
    sorted(
        [(s, 1) for s in
         ("ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta",
          "iva", "ic", "ice", "abile", "ibile", "oase", "ate", "itate",
          "ite", "ante", "ute", "ive", "ici", "abili", "ibili", "atori",
          "osi", "ati", "itati", "iti", "anti", "uti", "ivi",
          "ităi", "oşi", "ităţi", "abil", "ibil",
          "ator", "os", "at", "it", "ant", "ut", "iv", "ică",
          "abilă", "ibilă", "oasă", "ată",
          "ită", "antă", "ută", "ivă")]
        + [("iune", 2), ("iuni", 2)]
        + [(s, 3) for s in
           ("ista", "isme", "iste", "isti", "işti", "ism", "ist",
            "istă")],
        key=lambda e: -len(e[0]),
    )
)

# a_4 (verb_suffix): action 1 = delete if preceded (inside the pV window)
# by a non-vowel or by 'u'; action 2 = delete
_RO_VERB = tuple(
    sorted(
        [(s, 2) for s in
         ("se", "sese", "sei", "seşi", "seseşi", "aţi",
          "eţi", "iţi", "âţi", "serăţi",
          "seserăţi", "em", "sesem", "im", "âm",
          "ăm", "serăm", "seserăm", "seră",
          "seseră")]
        + [(s, 1) for s in
           ("ea", "ia", "esc", "ăsc", "ind", "ând", "are",
            "ere", "ire", "âre", "ase", "ise", "use", "âse",
            "eşte", "ăşte", "eze", "ai", "eai", "iai",
            "eşti", "ăşti", "ui", "ezi", "âi",
            "aşi", "aseşi", "iseşi", "useşi",
            "âseşi", "işi", "uşi", "âşi",
            "eaţi", "iaţi", "arăţi",
            "aserăţi", "iserăţi", "userăţi",
            "âserăţi", "irăţi", "urăţi",
            "ârăţi", "am", "eam", "iam", "asem", "isem",
            "usem", "âsem", "arăm", "aserăm",
            "iserăm", "userăm", "âserăm",
            "irăm", "urăm", "ârăm", "au", "eau",
            "iau", "indu", "ându", "ez", "ească", "ară",
            "aseră", "iseră", "useră", "âseră",
            "iră", "ură", "âră", "ează")],
        key=lambda e: -len(e[0]),
    )
)

_RO_VOWEL_SUF = ("ie", "a", "e", "i", "ă")


def _ro_prelude(s: str) -> str:
    """romanian.sbl prelude: left-to-right, u/i with a vowel on both
    sides -> U/I. The left flank reads the MARKED string (a replaced
    char is uppercase, i.e. a consonant for later checks); the right
    flank reads ahead of the cursor, i.e. the original lowercase."""
    out = list(s)
    for i in range(1, len(s) - 1):
        if (
            out[i] in ("u", "i")
            and out[i - 1] in _RO_VOWELS
            and s[i + 1] in _RO_VOWELS
        ):
            out[i] = out[i].upper()
    return "".join(out)


def _ro_pv(s: str) -> int:
    """Spanish-style RV (romanian.sbl mark_regions): if the second char
    is a consonant, after the next vowel; if the first two chars are
    vowels, after the next consonant; otherwise (consonant-vowel)
    position 3. End of word when the scan fails."""
    n = len(s)
    if n < 2:
        return n
    if s[1] not in _RO_VOWELS:
        i = 2
        while i < n and s[i] not in _RO_VOWELS:
            i += 1
        return i + 1 if i < n else n
    if s[0] in _RO_VOWELS:
        i = 2
        while i < n and s[i] in _RO_VOWELS:
            i += 1
        return i + 1 if i < n else n
    return 3 if n >= 3 else n


def romanian_stem(token: str) -> str:
    """Snowball Romanian (RomanianStemmer.cs Stem: prelude ->
    mark_regions -> backwards do(step_0) do(standard_suffix)
    do(standard_suffix_removed or verb_suffix) do(vowel_suffix) ->
    postlude)."""
    s = _ro_prelude(token)
    pV = _ro_pv(s)
    p1 = _region_after(s, 0, _RO_VOWELS)
    p2 = _region_after(s, p1, _RO_VOWELS)
    # step_0: longest a_1 match, then R1 (fail-no-retry)
    n = len(s)
    for suf, repl in _RO_STEP0:
        if s.endswith(suf):
            pos = n - len(suf)
            if pos >= p1 and not (suf == "ile" and s[:pos].endswith("ab")):
                s = s[:pos] + (repl or "")
            break
    # standard_suffix: repeat combo_suffix (R1), then a_3 (R2); the
    # flag records whether ANY of them fired
    fired = False
    while True:
        n = len(s)
        hit = False
        for suf, repl in _RO_COMBO:
            if s.endswith(suf):
                if n - len(suf) >= p1:
                    s = s[: n - len(suf)] + repl
                    fired = hit = True
                break
        if not hit:
            break
    n = len(s)
    for suf, act in _RO_STD:
        if s.endswith(suf):
            pos = n - len(suf)
            if pos < p2:
                break
            if act == 1:
                s = s[:pos]
                fired = True
            elif act == 2:
                if pos >= 1 and s[pos - 1] == "ţ":
                    s = s[: pos - 1] + "t"
                    fired = True
            else:
                s = s[:pos] + "ist"
                fired = True
            break
    # verb_suffix only when standard_suffix removed nothing; the among
    # match itself is limited to the [pV:] window (longest that FITS)
    if not fired:
        n = len(s)
        for suf, act in _RO_VERB:
            pos = n - len(suf)
            if pos >= pV and s.endswith(suf):
                if act == 2:
                    s = s[:pos]
                elif pos > pV and (
                    s[pos - 1] not in _RO_VOWELS or s[pos - 1] == "u"
                ):
                    s = s[:pos]
                break
    # vowel_suffix: longest a_5 match, then RV (fail-no-retry)
    n = len(s)
    for suf in _RO_VOWEL_SUF:
        if s.endswith(suf):
            if n - len(suf) >= pV:
                s = s[: n - len(suf)]
            break
    return s.replace("I", "i").replace("U", "u")


# -- Basque -------------------------------------------------------------------
# snowball basque.sbl (Olatz Perez de Viñaspre / Maite Oronoz); data checked
# against Tartarus/Snowball/Ext/BasqueStemmer.cs a_0..a_2 + g_v (a e i o u).
# The three rules run as backward REPEATs with NO test wrapper: each fire
# leaves the cursor at the START of the matched suffix (SliceDel/SliceFrom
# leave m_cursor = m_bra), so the next iteration matches the text to the
# LEFT of the previous match — the repeat walks leftward through the word,
# and the izenak loop CONTINUES from wherever aditzak stopped. Region marks
# are absolute indexes into the original string; every mutation happens at
# positions >= the next match's start, so the untouched prefix keeps them
# valid (the generated runtime likewise never adjusts I_pV/I_p1/I_p2).

_EU_VOWELS = frozenset("aeiou")

# actions: 1 = delete in RV, 2 = delete in R2, 4 = delete in R1,
# otherwise an unconditional replacement (identity entries are word guards:
# they consume the suffix position and move the walk left of it)
_EU_ADITZAK = (
    ("tzailea", 1), ("arabera", "arabera"), ("atseden", "atseden"),
    ("kundea", 1),
    ("tailea", 1), ("taldia", 1), ("garria", 2), ("karria", 1),
    ("tezina", 1), ("kizuna", 1), ("gailua", 1), ("erreza", 1),
    ("gaitza", 1), ("kaitza", 1), ("kuntza", 1), ("tzaile", 1),
    ("tarazi", 1), ("aldatu", 1), ("baditu", "baditu"), ("bidea", 1),
    ("kidea", 1), ("pidea", 1), ("galea", 1), ("gunea", 1), ("kunea", 1),
    ("tzaga", 1), ("aldia", 1), ("karia", 1), ("tzaka", 1), ("ezina", 1),
    ("korra", 1), ("kunde", 1), ("tzake", 1), ("tzeke", 1), ("taile", 1),
    ("taldi", 1), ("etari", 1), ("garri", 2), ("karri", 1), ("arazi", 1),
    ("rekin", 1), ("tezin", 1), ("kizun", 1), ("gailu", 1), ("errez", 1),
    ("gaitz", 1), ("kaitz", 1), ("idea", 1), ("gaia", 1), ("mena", 1),
    ("pena", 1), ("kina", 1), ("kuna", 1), ("tuna", 1), ("bera", 1),
    ("kera", 1), ("pera", 1), ("orra", 1), ("dura", 1), ("gura", 1),
    ("kura", 1), ("tura", 1), ("keta", 1), ("bide", 1), ("kide", 1),
    ("pide", 1), ("gale", 1), ("gune", 1), ("kune", 1), ("atze", 1),
    ("aldi", 1), ("kari", 1), ("lari", 1), ("tari", 1), ("rean", 1),
    ("etan", 1), ("ezin", 1), ("dako", 1), ("tzat", 1), ("tatu", 1),
    ("tzez", 1), ("era", 1), ("eta", 1), ("eza", 1), ("tza", 2),
    ("ide", 1), ("tze", 1), ("gai", 1), ("ari", 1), ("ean", 1), ("kan", 1),
    ("men", 1), ("pen", 1), ("kin", 1), ("tun", 1), ("ago", 1), ("tio", 1),
    ("kor", 1), ("atu", 1), ("ka", 1), ("la", 1), ("le", 1), ("ki", 1),
    ("an", 1), ("go", 1), ("or", 1), ("du", 1), ("tu", 1), ("ez", 1),
)

_EU_IZENAK = (
    ("minutuko", "minutu"), ("garrena", 1), ("gerrena", 1), ("kaldea", 1),
    ("taldea", 1), ("tzalea", 1), ("zionea", 1), ("aurrea", 1),
    ("taldia", 1), ("handia", 1), ("mendia", 1), ("garria", 2),
    ("larria", 1), ("kirria", 1), ("ontzia", 1), ("gibela", 1),
    ("urrena", 1), ("tzaina", 1), ("tasuna", 1), ("kondoa", 1),
    ("tzarra", 1), ("mendua", 1), ("mentua", 1), ("koitza", 1),
    ("gintza", 1), ("kintza", 1), ("kuntza", 1), ("garren", 1),
    ("gerren", 1), ("tariko", 1), ("gintzo", 1), ("gintzu", 1),
    ("denda", 1), ("gabea", 1), ("kabea", 1), ("aldea", 1), ("ordea", 1),
    ("zalea", 1), ("gilea", 1), ("kumea", 1), ("gunea", 1), ("kotea", 1),
    ("artea", 1), ("ostea", 1), ("etxea", 1), ("aldia", 1), ("degia", 1),
    ("tegia", 1), ("nahia", 1), ("tokia", 1), ("karia", 1), ("laria", 1),
    ("taria", 1), ("keria", 1), ("teria", 1), ("duria", 1), ("bizia", 1),
    ("aurka", "aurka"), ("kaila", 1), ("skila", 1), ("zaina", 1),
    ("garna", 1),
    ("asuna", 1), ("ondoa", 1), ("takoa", 1), ("zinoa", 1), ("taroa", 1),
    ("zaroa", 1), ("liara", 1), ("tiara", 1), ("etara", 1), ("tzara", 1),
    ("korra", 1), ("ordua", 1), ("lekua", 1), ("burua", 1), ("durua", 1),
    ("estua", 1), ("eroza", 1), ("antza", 1), ("kalde", 1), ("talde", 1),
    ("tzale", 1), ("zione", 1), ("aurre", 1), ("taldi", 1),
    ("geldi", "geldi"),
    ("handi", 1), ("mendi", 1), ("garri", 2), ("larri", 1), ("kirri", 1),
    ("ontzi", 1), ("tarik", 1), ("gibel", 1), ("urren", 1), ("tzain", 1),
    ("tasun", 1), ("aizun", 1), ("kondo", 1), ("trako", "tra"),
    ("etako", 1),
    ("igaro", "igaro"), ("behar", 1), ("zehar", "zehar"), ("mendu", 1),
    ("mentu", 1),
    ("koitz", 1), ("kada", 1), ("anda", 1), ("emea", 1), ("enea", 1),
    ("unea", 1), ("anga", 1), ("gaia", 1), ("geia", 1), ("egia", 1),
    ("ohia", 1), ("koia", 1), ("aria", 1), ("eria", 1), ("asia", 1),
    ("ezia", 1), ("joka", "jok"), ("gela", 1), ("tila", 1), ("kana", 1),
    ("kina", 1), ("mina", 1), ("duna", 1), ("ngoa", 1), ("zioa", 1),
    ("zkoa", 1), ("aroa", 1), ("eroa", 1), ("oroa", 1), ("osoa", 1),
    ("ttoa", 1), ("ztoa", 1), ("txoa", 1), ("tzoa", 1), ("dara", 1),
    ("tara", 1), ("bera", 1), ("kera", 1), ("pera", 1), ("keta", 1),
    ("tsua", 1), ("txua", 1), ("tzua", 1), ("gabe", 1), ("kabe", 1),
    ("kide", 1), ("alde", 1), ("orde", 1), ("zale", 1), ("gile", 1),
    ("kume", 1), ("gune", 1), ("kote", 1), ("arte", 1), ("oste", 1),
    ("etxe", 1), ("aldi", 1), ("degi", 1), ("tegi", 1), ("nahi", 1),
    ("toki", 1), ("kari", 1), ("lari", 1), ("tari", 1), ("duri", 1),
    ("kail", 1), ("etan", 1), ("tzen", 4), ("zain", 1), ("asun", 1),
    ("ondo", 1), ("tako", 1), ("tuko", 1), ("zino", 1), ("taro", 1),
    ("zaro", 1), ("giro", 1), ("liar", 1), ("tiar", 1), ("tzar", 1),
    ("ordu", 1), ("leku", 1), ("buru", 2), ("duru", 1), ("tatu", 4),
    ("estu", 1), ("eroz", 1), ("ada", 1), ("nea", 1), ("pea", 1),
    ("tea", 1), ("kia", 1), ("oia", 1), ("tia", 1), ("ska", 1), ("xka", 1),
    ("zka", 1), ("ola", 1), ("ena", 1), ("una", 1), ("koa", 1), ("noa", 1),
    ("toa", 1), ("ñoa", 1), ("ara", 1), ("ora", 2), ("tra", 1), ("osa", 1),
    ("eta", 1), ("sta", 1), ("dua", 1), ("tua", 1), ("zua", 1), ("eza", 1),
    ("tza", 2), ("eme", 1), ("une", 1), ("gai", 1), ("gei", 1), ("egi", 1),
    ("ohi", 1), ("goi", 1), ("koi", 1), ("ari", 1), ("asi", 1), ("ail", 1),
    ("kan", 1), ("tan", 1), ("ren", 2), ("ten", 4), ("kin", 1), ("min", 1),
    ("dun", 1), ("ngo", 1), ("zio", 1), ("eko", 1), ("sko", 1), ("zko", 1),
    ("aro", 1), ("ero", 1), ("oro", 1), ("oso", 1), ("tto", 1), ("zto", 1),
    ("txo", 1), ("tzo", 1), ("dar", 1), ("tar", 1), ("kor", 1), ("ket", 1),
    ("tsu", 1), ("txu", 1), ("tzu", 1), ("ga", 1), ("ka", 1), ("na", 1),
    ("ra", 1), ("sa", 1), ("ta", 1), ("za", 1), ("ge", 1), ("ne", 1),
    ("pe", 1), ("te", 1), ("di", 1), ("ki", 1), ("oi", 1), ("ti", 1),
    ("ñi", 1), ("ak", 1), ("ek", 1), ("en", 4), ("go", 1), ("ko", 1),
    ("no", 1), ("ro", 1), ("to", 1), ("ño", 1), ("zp", 1), ("ar", 1),
    ("or", 2), ("os", 1), ("du", 1), ("tu", 1), ("zu", 1), ("ez", 1),
    ("tz", 1), ("z", 1),
)

_EU_ADJ = (
    ("keria", 1), ("lanik", 1), ("larik", 1), ("zlea", "z"), ("dade", 1),
    ("tade", 1), ("date", 1), ("tate", 1), ("ztik", 1), ("era", 1),
    ("rik", 1), ("ero", 1), ("la", 1), ("gi", 1), ("ki", 1), ("ik", 1),
    ("go", 1), ("ro", 1), ("to", 1),
)


def _spanish_pv(s: str, vowels: frozenset) -> int:
    """The Spanish-family RV (basque/romanian mark_regions): second char
    consonant -> after the next vowel; first two chars vowels -> after
    the next consonant; consonant-vowel -> position 3; end of word when
    the scan fails."""
    n = len(s)
    if n < 2:
        return n
    if s[1] not in vowels:
        i = 2
        while i < n and s[i] not in vowels:
            i += 1
        return i + 1 if i < n else n
    if s[0] in vowels:
        i = 2
        while i < n and s[i] in vowels:
            i += 1
        return i + 1 if i < n else n
    return 3 if n >= 3 else n


def _eu_rule(s: str, e: int, table: tuple, pv: int, p1: int, p2: int):
    """One basque rule call with the suffix end at `e`: the longest table
    suffix of s[:e], then the action's region check (fail-no-retry).
    Returns (new_s, new_e) or None when the rule fails."""
    head = s[:e]
    for suf, act in table:
        if head.endswith(suf):
            pos = e - len(suf)
            if isinstance(act, str):
                return s[:pos] + act + s[e:], pos
            bound = pv if act == 1 else (p2 if act == 2 else p1)
            if pos < bound:
                return None
            return s[:pos] + s[e:], pos
    return None


def basque_stem(token: str) -> str:
    """Snowball Basque (BasqueStemmer.cs Stem: mark_regions -> backwards
    repeat(aditzak) repeat(izenak) do(adjetiboak) — the repeats walk
    leftward, and each stage resumes at the previous stage's stop)."""
    s = token
    pv = _spanish_pv(s, _EU_VOWELS)
    p1 = _region_after(s, 0, _EU_VOWELS)
    p2 = _region_after(s, p1, _EU_VOWELS)
    e = len(s)
    for table in (_EU_ADITZAK, _EU_IZENAK):
        while True:
            r = _eu_rule(s, e, table, pv, p1, p2)
            if r is None:
                break
            s, e = r
    r = _eu_rule(s, e, _EU_ADJ, pv, p1, p2)
    if r is not None:
        s, e = r
    return s


# -- Irish --------------------------------------------------------------------
# IrishAnalyzer.cs chain: StopFilter(HYPHENATIONS h/n/t, ignoreCase) ->
# ElisionFilter(d m b, ignoreCase) -> IrishLowerCaseFilter (t-prothesis /
# n-eclipsis hyphenation + lowercase) -> stop -> SnowballFilter(IrishStemmer).
# The first three stages need the RAW token (the prothesis rule reads the
# original case), so the slot registers as a raw-PRE analyzer
# (analysis.pre_takes_raw). Stemmer data checked against
# Tartarus/Snowball/Ext/IrishStemmer.cs a_0..a_3 + g_v (a e i o u á é í ó ú).

_GA_VOWELS = frozenset("aeiouáéíóú")
_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")
_GA_HYPHENATIONS = frozenset("hnt")
_GA_ARTICLES = frozenset("dmb")

# initial_morph (a_0): longest PREFIX match, unconditional rewrite
_GA_INITIAL = (
    ("d'fh", "f"), ("bhf", "f"),
    ("h-", ""), ("n-", ""), ("t-", ""), ("d'", ""), ("b'", ""), ("m'", ""),
    ("sh", "s"), ("mb", "b"), ("gc", "c"), ("nd", "d"), ("ng", "g"),
    ("bp", "p"), ("ts", "s"), ("dt", "t"), ("bh", "b"), ("ch", "c"),
    ("dh", "d"), ("fh", "f"), ("gh", "g"), ("mh", "m"), ("ph", "p"),
    ("th", "t"),
)

# noun_sfx (a_1): 1 = R1 delete, 2 = R2 delete
_GA_NOUN = (
    ("aíochta", 1), ("íochta", 1), ("aíocht", 1), ("íocht", 1),
    ("aire", 2), ("eabh", 1), ("aibh", 1), ("eamh", 1), ("aimh", 1),
    ("airí", 2), ("ire", 2), ("abh", 1), ("ibh", 1), ("amh", 1),
    ("imh", 1), ("irí", 2),
)

# deriv (a_2): 1 = R2 delete, otherwise an unconditional replacement
_GA_DERIV = (
    ("grafaíochtaí", "graf"), ("grafaíochta", "graf"),
    ("grafaíocht", "graf"), ("grafaíoch", "graf"),
    ("arcachtaí", "arc"), ("óideacha", "óid"), ("arcachta", "arc"),
    ("eachtúil", 1), ("patacha", "paite"), ("óideach", "óid"),
    ("gineach", "gin"), ("pataigh", "paite"), ("achtúil", 1),
    ("arcacht", "arc"), ("eachta", 1), ("patach", "paite"),
    ("óidigh", "óid"), ("gineas", "gin"), ("achta", 1),
    ("paite", "paite"), ("ginis", "gin"), ("eacht", 1), ("each", 1),
    ("acht", 1), ("ach", 1),
)

# verb_sfx (a_3): 1 = RV delete, 2 = R1 delete
_GA_VERB = (
    ("aimid", 1), ("aímid", 1), ("faidh", 1), ("imid", 1), ("ímid", 1),
    ("eadh", 2), ("fidh", 1), ("tear", 2), ("adh", 2), ("áil", 2),
    ("ain", 2), ("tar", 2),
)


def irish_pre(tok: str) -> str:
    """The three pre-stop Irish stages over ONE raw tokenizer match:
    HYPHENATIONS stop (h/n/t any case -> '' sentinel, which sits in the
    slot's stop set), ElisionFilter (case-insensitive d'/m'/b' strip at
    the first apostrophe), then IrishLowerCaseFilter: lowercase 'n'/'t'
    followed by an UPPERCASE vowel inserts '-' (nAthair -> n-athair;
    all-lowercase nathair is untouched), everything after lowercases."""
    low = tok.lower()
    if low in _GA_HYPHENATIONS:
        return ""
    # ElisionFilter.cs:59 splits at the FIRST ' or ’ only
    for i, ch in enumerate(tok):
        if ch in ("'", "’"):
            if tok[:i].lower() in _GA_ARTICLES:
                tok = tok[i + 1 :]
            break
    if len(tok) > 1 and tok[0] in ("n", "t") and tok[1] in _GA_UPPER_VOWELS:
        return tok[0] + "-" + tok[1:].lower()
    return tok.lower()


def irish_stem(token: str) -> str:
    """Snowball Irish (IrishStemmer.cs Stem: do(initial_morph) ->
    do(mark_regions) on the REWRITTEN string -> backwards do(noun_sfx)
    do(deriv) do(verb_sfx)). pV is after the first vowel; p1/p2 standard;
    every among match checks its region AFTER selection (fail-no-retry)."""
    s = token
    for pre, repl in _GA_INITIAL:
        if s.startswith(pre):
            s = repl + s[len(pre):]
            break
    n = len(s)
    i = 0
    while i < n and s[i] not in _GA_VOWELS:
        i += 1
    pv = i + 1 if i < n else n
    p1 = _region_after(s, 0, _GA_VOWELS)
    p2 = _region_after(s, p1, _GA_VOWELS)
    n = len(s)
    for suf, act in _GA_NOUN:
        if s.endswith(suf):
            if n - len(suf) >= (p1 if act == 1 else p2):
                s = s[: n - len(suf)]
            break
    n = len(s)
    for suf, act in _GA_DERIV:
        if s.endswith(suf):
            if isinstance(act, str):
                s = s[: n - len(suf)] + act
            elif n - len(suf) >= p2:
                s = s[: n - len(suf)]
            break
    n = len(s)
    for suf, act in _GA_VERB:
        if s.endswith(suf):
            if n - len(suf) >= (pv if act == 1 else p1):
                s = s[: n - len(suf)]
            break
    return s
