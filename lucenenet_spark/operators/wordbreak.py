"""WordBreakSpellChecker (Lucene.Net.Suggest/Spell/WordBreakSpellChecker.cs).

SuggestWordBreaks recursively splits a term at every code-point boundary
(minBreakWordLength .. length-minBreakWordLength); a split survives when
BOTH sides meet the frequency floor, and the right side recurses while
numberBreaks < maxChanges. Results rank by fewest words, then highest
max-frequency (NUM_CHANGES_THEN_MAX_FREQUENCY) or highest summed
frequency; every word in an n-way suggestion carries score = n-1.
SuggestWordCombinations merges runs of up to maxChanges+1 adjacent terms
whose combined text is <= maxCombineWordLength code points, subject to
the suggest mode's frequency rules; score = number of merged gaps.

All DocFreq probes go through the searcher's cached term-stats scan —
the full set of substrings is prefetched in ONE batched lookup, so the
recursion itself runs driver-side with zero extra jobs.
"""
from __future__ import annotations

from dataclasses import dataclass

MODE_WHEN_NOT_IN_INDEX = "SUGGEST_WHEN_NOT_IN_INDEX"
MODE_MORE_POPULAR = "SUGGEST_MORE_POPULAR"
MODE_ALWAYS = "SUGGEST_ALWAYS"

SORT_MAX_FREQ = "NUM_CHANGES_THEN_MAX_FREQUENCY"
SORT_SUM_FREQ = "NUM_CHANGES_THEN_SUMMED_FREQUENCY"

SEPARATOR = ""  # SEPARATOR_TERM — an empty-text term breaks combine runs


@dataclass(frozen=True)
class SuggestWord:
    string: str
    freq: int
    score: int


class WordBreakSpellChecker:
    def __init__(
        self,
        searcher,
        field: str = "text",
        min_suggestion_frequency: int = 1,
        min_break_word_length: int = 1,
        max_combine_word_length: int = 20,
        max_changes: int = 1,
        max_evaluations: int = 1000,
    ):
        self.searcher = searcher
        self.field = field
        self.min_suggestion_frequency = min_suggestion_frequency
        self.min_break_word_length = min_break_word_length
        self.max_combine_word_length = max_combine_word_length
        self.max_changes = max_changes
        self.max_evaluations = max_evaluations

    # -- df plumbing ---------------------------------------------------------
    def _prefetch_substrings(self, text: str) -> dict[str, int]:
        subs = {
            text[i:j]
            for i in range(len(text))
            for j in range(i + 1, len(text) + 1)
        }
        dfs = self.searcher.doc_freqs([(self.field, s) for s in subs])
        return {t: df for (_f, t), df in dfs.items()}

    def _df_many(self, texts) -> dict[str, int]:
        dfs = self.searcher.doc_freqs([(self.field, t) for t in set(texts)])
        return {t: df for (_f, t), df in dfs.items()}

    # -- SuggestWordBreaks ---------------------------------------------------
    def suggest_word_breaks(
        self,
        word: str,
        max_suggestions: int,
        suggest_mode: str = MODE_WHEN_NOT_IN_INDEX,
        sort_method: str = SORT_MAX_FREQ,
    ) -> list[list[SuggestWord]]:
        if max_suggestions < 1:
            return []
        df = self._prefetch_substrings(word)
        orig_freq = df.get(word, 0)
        if orig_freq > 0 and suggest_mode == MODE_WHEN_NOT_IN_INDEX:
            return []
        floor = self.min_suggestion_frequency
        if suggest_mode == MODE_MORE_POPULAR:
            floor = 1 if orig_freq == 0 else orig_freq

        suggestions: list[tuple[tuple, list[SuggestWord]]] = []

        def sort_key(words: list[SuggestWord]) -> tuple:
            freqs = [w.freq for w in words]
            freq_part = (
                max(freqs) if sort_method == SORT_MAX_FREQ else sum(freqs)
            )
            # better = fewer words, then HIGHER freq
            return (len(words), -freq_part)

        def generate(
            text: str,
            number_breaks: int,
            prefix: list[SuggestWord],
            total_evaluations: int,
        ) -> int:
            """GenerateBreakUpSuggestions: total_evaluations is BY VALUE
            (the reference accumulates child counts only locally) and the
            return value is thisTimeEvaluations — this loop's splits only,
            exactly like the reference's approximate cap."""
            min_len = max(1, self.min_break_word_length)
            if len(text) < min_len * 2:
                return 0
            this_time = 0
            for i in range(min_len, len(text) - min_len + 1):
                left, right = text[:i], text[i:]
                if df.get(left, 0) >= floor:
                    if df.get(right, 0) >= floor:
                        score = len(prefix) + 1
                        words = (
                            [
                                SuggestWord(p.string, p.freq, score)
                                for p in prefix
                            ]
                            + [
                                SuggestWord(left, df.get(left, 0), score),
                                SuggestWord(right, df.get(right, 0), score),
                            ]
                        )
                        suggestions.append((sort_key(words), words))
                        suggestions.sort(key=lambda kv: kv[0])
                        if len(suggestions) > max_suggestions:
                            suggestions.pop()  # evict the worst
                    if number_breaks + 1 <= self.max_changes:
                        total_evaluations += generate(
                            right,
                            number_breaks + 1,
                            prefix
                            + [SuggestWord(left, df.get(left, 0), 0)],
                            total_evaluations,
                        )
                this_time += 1
                total_evaluations += 1
                if total_evaluations >= self.max_evaluations:
                    break
            return this_time

        generate(word, 1, [], 0)
        return [words for _k, words in suggestions]

    # -- SuggestWordCombinations ----------------------------------------------
    def suggest_word_combinations(
        self,
        terms: list[str],
        max_suggestions: int,
        suggest_mode: str = MODE_WHEN_NOT_IN_INDEX,
    ) -> list[tuple[SuggestWord, list[int]]]:
        if max_suggestions < 1:
            return []
        orig_freqs = None
        if suggest_mode != MODE_ALWAYS:
            fmap = self._df_many([t for t in terms if t != SEPARATOR])
            orig_freqs = [fmap.get(t, 0) for t in terms]
        # prefetch every candidate combined run in one lookup
        candidates = []
        for i in range(len(terms) - 1):
            if terms[i] == SEPARATOR:
                continue
            combined = terms[i]
            for j in range(i + 1, min(len(terms), i + self.max_changes + 1)):
                if terms[j] == SEPARATOR:
                    break
                combined += terms[j]
                if len(combined) > self.max_combine_word_length:
                    break
                candidates.append(combined)
        cmap = self._df_many(candidates) if candidates else {}

        out: list[tuple[tuple, SuggestWord, list[int]]] = []
        evals = 0
        for i in range(len(terms) - 1):
            if terms[i] == SEPARATOR:
                continue
            left = terms[i]
            if len(left) > self.max_combine_word_length:
                continue
            max_freq = orig_freqs[i] if orig_freqs else 0
            min_freq = orig_freqs[i] if orig_freqs else 2**31 - 1
            combined = left
            for j in range(i + 1, min(len(terms), i + self.max_changes + 1)):
                if terms[j] == SEPARATOR:
                    break
                combined += terms[j]
                if len(combined) > self.max_combine_word_length:
                    break
                if orig_freqs is not None:
                    max_freq = max(max_freq, orig_freqs[j])
                    min_freq = min(min_freq, orig_freqs[j])
                cf = cmap.get(combined, 0)
                if (
                    suggest_mode != MODE_MORE_POPULAR or cf >= max_freq
                ) and (
                    suggest_mode != MODE_WHEN_NOT_IN_INDEX or min_freq == 0
                ):
                    if cf >= self.min_suggestion_frequency:
                        idxs = list(range(i, j + 1))
                        # better = FEWER merges, then higher freq
                        # (CombinationsThenFreqComparer min-heap eviction)
                        out.append(
                            (
                                (len(idxs) - 1, -cf),
                                SuggestWord(combined, cf, len(idxs) - 1),
                                idxs,
                            )
                        )
                        out.sort(key=lambda kv: kv[0])
                        if len(out) > max_suggestions:
                            out.pop()
                evals += 1
                # reference quirk: the cap compares with == only, so
                # once passed it never fires again
                if evals == self.max_evaluations:
                    break
        return [(w, idxs) for _k, w, idxs in out]
