"""Aho-Corasick multi-pattern substring automaton (Aho & Corasick
1975) — simultaneous search for a broadcast pattern set in one pass
over each document, the right tool for corpus-scale phrase blocklists
(C4's "bad words" filter shape) where per-pattern scans would cost
O(patterns × text).

Pure-Python but built ONCE per actor (the goto/fail tables are the
per-worker state); matching advances one automaton step per input
character regardless of pattern count.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    def __init__(self, patterns: list[str]):
        self.patterns = list(patterns)
        # state 0 is the root; goto is a list of dicts char -> state
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[set[int]] = [set()]
        self._fail: list[int] = [0]
        for pid, pat in enumerate(self.patterns):
            self._insert(pat, pid)
        self._build_failure_links()

    def _insert(self, pat: str, pid: int) -> None:
        s = 0
        for ch in pat:
            nxt = self._goto[s].get(ch)
            if nxt is None:
                nxt = len(self._goto)
                self._goto.append({})
                self._out.append(set())
                self._fail.append(0)
                self._goto[s][ch] = nxt
            s = nxt
        self._out[s].add(pid)

    def _build_failure_links(self) -> None:
        q: deque[int] = deque()
        for s in self._goto[0].values():
            self._fail[s] = 0
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self._goto[r].items():
                q.append(s)
                f = self._fail[r]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[s] = self._goto[f].get(ch, 0)
                if self._fail[s] == s:  # root self-loop guard
                    self._fail[s] = 0
                self._out[s] |= self._out[self._fail[s]]

    def match_ids(self, text: str) -> set[int]:
        """Distinct pattern ids occurring (as substrings, overlaps
        included) anywhere in ``text``."""
        found: set[int] = set()
        s = 0
        for ch in text:
            while s and ch not in self._goto[s]:
                s = self._fail[s]
            s = self._goto[s].get(ch, 0)
            if self._out[s]:
                found |= self._out[s]
                if len(found) == len(self.patterns):
                    break  # every pattern already seen
        return found
