"""Lexicon-based transcription correction.

Re-implements reference ``glass/evaluation/lexicon_utils.py`` (MTSv3-style)
with the internal hardcoded paths replaced by explicit file arguments:
closest lexicon word by (optionally confidence-weighted) edit distance,
accepted when the distance is below the threshold.
"""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np
import Levenshtein

logger = logging.getLogger(__name__)


def weighted_edit_distance(word1: str, word2: str, scores: Sequence[float]) -> float:
    """Edit distance where substituting/deleting a low-confidence predicted
    character is cheaper (reference lexicon_utils.weighted_edit_distance)."""
    m, n = len(word1), len(word2)
    dp = np.zeros((m + 1, n + 1), np.float64)
    dp[0, :] = np.arange(n + 1)
    dp[:, 0] = np.arange(m + 1)
    for i in range(1, m + 1):
        ci = scores[i - 1] if i - 1 < len(scores) else 1.0
        for j in range(1, n + 1):
            if word1[i - 1] == word2[j - 1]:
                dp[i, j] = dp[i - 1, j - 1]
            else:
                dp[i, j] = min(
                    dp[i - 1, j] + ci,          # delete predicted char
                    dp[i, j - 1] + 1.0,          # insert
                    dp[i - 1, j - 1] + ci,       # substitute
                )
    return float(dp[m, n])


class Lexicon:
    def __init__(
        self,
        words: Sequence[str],
        weighted: bool = False,
        max_distance: float = 2.5,
        case_sensitive: bool = False,
    ):
        self.words = list(words)
        self.weighted = weighted
        self.max_distance = max_distance
        self.case_sensitive = case_sensitive
        self._cmp_words = self.words if case_sensitive else [w.upper() for w in self.words]

    @classmethod
    def from_file(cls, path: str, **kwargs) -> "Lexicon":
        with open(path, "r", encoding="utf-8") as f:
            words = [line.strip() for line in f if line.strip()]
        return cls(words, **kwargs)

    def correct(self, text: str, char_scores=None, codec=None) -> str:
        if not self.words or not text:
            return text
        query = text if self.case_sensitive else text.upper()
        best_dist, best_word = float("inf"), text
        for word, cmp_word in zip(self.words, self._cmp_words):
            if self.weighted and char_scores is not None:
                d = weighted_edit_distance(query, cmp_word, np.asarray(char_scores))
            else:
                d = Levenshtein.distance(query, cmp_word)
            if d < best_dist:
                best_dist, best_word = d, word
        if best_dist <= self.max_distance:
            return best_word
        return text
