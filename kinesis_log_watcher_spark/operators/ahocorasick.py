"""Aho-Corasick multi-pattern matching — the 100 TB blocklist kernel.

blocklist_phrase_filter (queries/round6b.py) screens the corpus against a
curated phrase list with a broadcast nested-loop: per row cost is
|blocklist| ``instr`` calls, which is the right plan for tens of phrases
but degrades linearly as the list grows. At thousands of phrases the
correct plan keeps the SAME join shape (broadcast the bounded pattern
set, stream the corpus, zero shuffle before the final rollup) but swaps
the per-row scan for an Aho-Corasick automaton: one pass over each text,
O(len + matches), independent of the phrase count.

This module is that swap, self-contained and dependency-free:

- :class:`AhoCorasick` — the classic goto/fail/output automaton
  (Aho & Corasick, CACM 1975), built once on the driver from the bounded
  pattern list and shipped to executors inside the mapInPandas closure
  (the broadcast role).
- :func:`match_distinct_kernel` — an Arrow-batched ``mapInPandas`` kernel
  emitting one (id, pattern_idx) row per DISTINCT pattern present in each
  text: exactly the relation the broadcast-``instr`` plan produces, so a
  DuckDB ``strpos`` oracle certifies the automaton end to end.

Reference parity note: the reference (/root/reference/main.go) has no
text-screening surface; this operator is part of the SURVEY.md §2.2
"beyond-reference" curation family.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator


class AhoCorasick:
    """Goto/fail/output automaton over unicode code points.

    Determinism: states are allocated in insertion order of the pattern
    list, fail links by BFS — the automaton is a pure function of the
    pattern tuple, so executor-side copies are identical.
    """

    def __init__(self, patterns: list[str] | tuple[str, ...]):
        if not patterns:
            raise ValueError("AhoCorasick needs at least one pattern")
        self.patterns = tuple(patterns)
        # state 0 is the root; goto is a list of dicts char -> state
        self._goto: list[dict[str, int]] = [{}]
        self._fail: list[int] = [0]
        # out[s] = tuple of pattern indices ENDING at state s (own +
        # everything reachable through the fail chain, pre-merged)
        self._out: list[tuple[int, ...]] = [()]

        for idx, pat in enumerate(self.patterns):
            if not pat:
                raise ValueError("empty pattern")
            s = 0
            for ch in pat:
                nxt = self._goto[s].get(ch)
                if nxt is None:
                    nxt = len(self._goto)
                    self._goto.append({})
                    self._fail.append(0)
                    self._out.append(())
                    self._goto[s][ch] = nxt
                s = nxt
            self._out[s] = self._out[s] + (idx,)

        # BFS fail links; merge output sets down the fail chain so the
        # scan never walks fail links to report matches.
        q: deque[int] = deque()
        for s in self._goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self._goto[r].items():
                q.append(s)
                f = self._fail[r]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[s] = self._goto[f].get(ch, 0)
                if self._fail[s] == s:  # root self-transition guard
                    self._fail[s] = 0
                if self._out[self._fail[s]]:
                    self._out[s] = self._out[s] + self._out[self._fail[s]]

    def finditer(self, text: str) -> Iterator[tuple[int, int]]:
        """Yield (end_offset_exclusive, pattern_idx) for every occurrence."""
        s = 0
        goto, fail, out = self._goto, self._fail, self._out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for idx in out[s]:
                    yield (i + 1, idx)

    def match_distinct(self, text: str) -> list[int]:
        """Sorted distinct pattern indices present in ``text`` — the
        containment relation a broadcast-instr plan produces."""
        seen: set[int] = set()
        npat = len(self.patterns)
        for _, idx in self.finditer(text):
            seen.add(idx)
            if len(seen) == npat:  # early exit: everything already hit
                break
        return sorted(seen)


def match_distinct_kernel(patterns: tuple[str, ...], id_col: str, text_col: str):
    """Build a mapInPandas kernel: (id, text) batches -> (id, pattern_idx)
    rows, one per distinct pattern contained in the text.

    The automaton is constructed once per executor task (lazily, first
    batch) from the bounded pattern tuple captured in the closure — the
    moral equivalent of a broadcast build side. Output schema:
    ``{id_col} <input type>, pattern_idx int``.
    """

    def kernel(batches):
        import pandas as pd

        ac = AhoCorasick(patterns)
        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for pidx in ac.match_distinct(text):
                    ids.append(doc_id)
                    idxs.append(pidx)
            yield pd.DataFrame({id_col: ids, "pattern_idx": idxs})

    return kernel
