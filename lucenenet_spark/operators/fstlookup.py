"""Suggest lookup family: FSTCompletionLookup, WFSTCompletionLookup,
TSTLookup, JaspellLookup (Lucene.Net.Suggest/Suggest/Fst/*.cs, Tst/*.cs,
Jaspell/JaspellLookup.cs).

These structures' DATA layout (FST/TST/trie) is storage detail; their
observable contracts are ordering + weight semantics, ported exactly:

  * FSTCompletionLookup: entries sorted by (int32 weight asc, utf8 key
    asc); bucket = line * buckets / count with equal-weight runs reusing
    the previous line's bucket (FSTCompletionLookup.cs Build). Lookup
    (higherWeightsFirst) returns prefix matches by (bucket desc, utf8
    asc) capped at num, then the exactMatchFirst fix-up: an existing
    exact hit moves to the front, a missing one evicts the tail and
    inserts at the front (FSTCompletion.cs CheckExistingAndReorder).
    The alphabetical mode collects ALL matches, sorts by utf8, caps.
    The reported value is the BUCKET, not the weight.
  * WFSTCompletionLookup: cost = Int32.MaxValue - weight; shortest
    paths = (weight desc, utf8 asc); exactFirst emits the exact hit
    first and excludes it from the path enumeration.
  * TSTLookup: in-order TST traversal = utf8-sorted prefix matches;
    onlyMorePopular re-ranks ALL matches by weight desc via
    LookupPriorityQueue, else the first num alphabetically.
  * JaspellLookup (usePrefix arm): like TST but the trie is asked for
    only num*2 matches when onlyMorePopular — the queue ranks that
    alphabetical PREFIX SLICE, a reference quirk kept here.
  * JaspellLookup (MatchAlmost arm, usePrefix=false): the trie's fuzzy
    walk (JaspellTernarySearchTrie.cs MatchAlmostRecursion, upTo=false)
    returns stored keys of EXACTLY the query's length that mismatch the
    query in EXACTLY matchAlmostDiff character positions (Hamming, no
    insert/delete — only the EQKID edge advances charIndex), where a
    "mismatch" compares CULTURE-LOWERCASED chars
    (CompareCharsAlphabetically: TextInfo.ToLower(a) - ToLower(b)).
    Enumeration order is the walk's in-order (LOKID, node, EQKID,
    HIKID) which for a BST is lexicographic on the lowercased key —
    independent of trie shape/insertion order — and the walk halts
    mid-enumeration once numReturnValues keys are collected, so
    truncation keeps the lexicographically FIRST count keys. Because
    Put routes by the same lowercased compare, keys that are
    lowercase-equal collapse onto one node: the FIRST-inserted surface
    form survives (GetKey rebuilds from creation-time splitchars) and
    the LAST-inserted value wins (GetOrCreateNode(key).data = value).
    JaspellLookup hardcodes MatchAlmostDiff = 2 (editDistance).
"""
from __future__ import annotations

INT32_MAX = 2**31 - 1


def _check_weight(w: int) -> int:
    if not (0 <= w <= INT32_MAX):
        raise ValueError("cannot represent weight as a 32-bit int")
    return int(w)


def fst_completion_build(
    entries: list[tuple[str, int]], buckets: int = 10
) -> dict[str, int]:
    """key -> bucket per FSTCompletionLookup.Build's discretization."""
    if not 1 <= buckets <= 255:
        raise ValueError("buckets must be within [1, 255]")
    rows = sorted(
        ((_check_weight(w), k.encode("utf-8"), k) for k, w in entries),
    )
    n = len(rows)
    table: dict[str, int] = {}
    prev_score = 0
    prev_bucket = 0
    for line, (score, _kb, key) in enumerate(rows):
        if line > 0 and score == prev_score:
            bucket = prev_bucket
        else:
            bucket = line * buckets // n
        prev_score, prev_bucket = score, bucket
        table[key] = bucket
    return table


def fst_completion_lookup(
    table: dict[str, int],
    key: str,
    num: int,
    higher_weights_first: bool = True,
    exact_first: bool = True,
) -> list[tuple[str, int]]:
    """[(completion, bucket)] per FSTCompletion.DoLookup."""
    if not key:
        return []
    matches = [(k, b) for k, b in table.items() if k.startswith(key)]
    if not higher_weights_first:
        return sorted(matches, key=lambda kb: kb[0].encode("utf-8"))[:num]
    res = sorted(
        matches, key=lambda kb: (-kb[1], kb[0].encode("utf-8"))
    )[:num]
    # the exactMatchFirst fix-up runs ONLY when Collect() filled the list
    # (returned true) — an unfilled list keeps natural order
    # (FSTCompletion.cs DoLookup / TestFullMatchList)
    if exact_first and len(matches) >= num and key in table:
        keys = [k for k, _b in res]
        if key in keys:
            res.insert(0, res.pop(keys.index(key)))
        else:
            while len(res) >= num:
                res.pop()
            res.insert(0, (key, table[key]))
    return res


def wfst_lookup(
    entries: dict[str, int], key: str, num: int, exact_first: bool = True
) -> list[tuple[str, int]]:
    """[(completion, weight)] per WFSTCompletionLookup.DoLookup."""
    for w in entries.values():
        _check_weight(w)
    matches = [(k, w) for k, w in entries.items() if k.startswith(key)]
    res: list[tuple[str, int]] = []
    if exact_first and key in entries:
        res.append((key, entries[key]))
        num -= 1
        if num == 0:
            return res
        matches = [m for m in matches if m[0] != key]
    res += sorted(
        matches, key=lambda kw: (-kw[1], kw[0].encode("utf-8"))
    )[:num]
    return res


def tst_lookup(
    entries: dict[str, int],
    key: str,
    num: int,
    only_more_popular: bool = False,
) -> list[tuple[str, int]]:
    """[(completion, weight)] per TSTLookup.DoLookup."""
    matches = sorted(
        ((k, w) for k, w in entries.items() if k.startswith(key)),
        key=lambda kw: kw[0].encode("utf-8"),
    )
    if not matches:
        return []
    if only_more_popular:
        return sorted(
            matches, key=lambda kw: (-kw[1], kw[0].encode("utf-8"))
        )[:num]
    return matches[:num]


def _jaspell_collapse(entries: dict[str, int]) -> dict[str, tuple[str, int]]:
    """lowercased key -> (surface, value) per the trie's Put routing:
    lowercase-equal keys share one node — first surface, last value."""
    out: dict[str, tuple[str, int]] = {}
    for k, w in entries.items():
        lk = k.lower()
        out[lk] = (out[lk][0] if lk in out else k, w)
    return out


def jaspell_match_almost(
    entries: dict[str, int],
    key: str,
    count: int | None,
    diff: int = 2,
) -> list[tuple[str, int]]:
    """JaspellTernarySearchTrie.MatchAlmost(key, count) as its observable
    contract (see module docstring): same-length stored keys at EXACTLY
    `diff` lowercase-Hamming mismatches, lexicographic on the lowercased
    key, truncated mid-walk at count (count None/-1 = unlimited). Pairs
    carry the trie value (JaspellLookup.DoLookup fetches it via Get)."""
    lkey = key.lower()
    nodes = _jaspell_collapse(entries)
    res: list[tuple[str, int]] = []
    for lk in sorted(nodes):
        if count is not None and count >= 0 and len(res) >= count:
            break
        if len(lk) != len(lkey):
            continue
        if sum(a != b for a, b in zip(lk, lkey)) == diff:
            res.append(nodes[lk])
    return res


def jaspell_lookup(
    entries: dict[str, int],
    key: str,
    num: int,
    only_more_popular: bool = False,
    use_prefix: bool = True,
    match_almost_diff: int = 2,
) -> list[tuple[str, int]]:
    """[(completion, weight)] per JaspellLookup.DoLookup: the prefix arm
    (usePrefix=true, the reference's construction default) or the
    MatchAlmost arm (usePrefix=false, editDistance=2)."""
    count = num * 2 if only_more_popular else num
    if use_prefix:
        slice_ = sorted(
            ((k, w) for k, w in entries.items() if k.startswith(key)),
            key=lambda kw: kw[0].encode("utf-8"),
        )[:count]
    else:
        slice_ = jaspell_match_almost(entries, key, count, match_almost_diff)
    if only_more_popular:
        return sorted(
            slice_, key=lambda kw: (-kw[1], kw[0].encode("utf-8"))
        )[:num]
    return slice_[:num]
