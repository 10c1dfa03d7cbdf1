"""A minimal reference Drain implementation (He et al., "Drain: An Online
Log Parsing Approach with Fixed Depth Tree", ICWS 2017 — public paper),
used ONLY as the parity baseline in tests/test_drain_parity.py.

Faithful to the paper's structure:
  1. preprocess: domain regexes replace obvious variables (numbers) with <*>
  2. fixed-depth parse tree: level 1 keys on token count, levels 2..depth
     key on the leading tokens (a token containing digits becomes <*>),
     with a maxChildren wildcard fallback
  3. leaf: similarity search over the groups in the leaf —
     simSeq = (# equal tokens) / len, wildcards excluded from equality;
     join the best group if simSeq >= st, else start a new group
  4. update: merged template replaces mismatching tokens with <*>
"""

from __future__ import annotations

import re


class _Group:
    __slots__ = ("template", "ids")

    def __init__(self, tokens: list[str], row_id: int):
        self.template = tokens
        self.ids = [row_id]


class DrainParser:
    def __init__(self, depth: int = 4, st: float = 0.5, max_children: int = 100):
        self.depth = depth  # levels of leading-token keys = depth - 2
        self.st = st
        self.max_children = max_children
        self.root: dict = {}

    @staticmethod
    def _preprocess(line: str) -> list[str]:
        return re.sub(r"\d+", "<*>", line.strip()).split()

    @staticmethod
    def _has_digit(tok: str) -> bool:
        return any(c.isdigit() for c in tok)

    def _leaf(self, tokens: list[str]) -> list[_Group]:
        node = self.root.setdefault(len(tokens), {})
        for d in range(min(self.depth - 2, len(tokens))):
            tok = tokens[d]
            key = "<*>" if self._has_digit(tok) else tok
            if key not in node and len(node) >= self.max_children:
                key = "<*>"
            node = node.setdefault(key, {})
        return node.setdefault("$groups", [])

    @staticmethod
    def _sim(a: list[str], b: list[str]) -> float:
        same = sum(1 for x, y in zip(a, b) if x == y and x != "<*>")
        return same / len(a) if a else 1.0

    def add(self, line: str, row_id: int) -> None:
        tokens = self._preprocess(line)
        groups = self._leaf(tokens)
        best, best_sim = None, -1.0
        for g in groups:
            s = self._sim(tokens, g.template)
            if s > best_sim:
                best, best_sim = g, s
        if best is not None and best_sim >= self.st:
            best.template = [
                x if x == y else "<*>" for x, y in zip(best.template, tokens)
            ]
            best.ids.append(row_id)
        else:
            groups.append(_Group(tokens, row_id))

    def assignments(self) -> dict[int, int]:
        """row_id -> group index (global enumeration)."""
        out: dict[int, int] = {}
        gid = 0

        def walk(node):
            nonlocal gid
            for k, v in node.items():
                if k == "$groups":
                    for g in v:
                        for rid in g.ids:
                            out[rid] = gid
                        gid += 1
                else:
                    walk(v)

        for sub in self.root.values():
            walk(sub)
        return out


def pairwise_f1(labels_a: dict[int, int], labels_b: dict[int, int]) -> float:
    """Pairwise-co-membership F1 between two clusterings of the same ids
    (standard log-parsing parity metric; computed from the contingency
    table, no O(n^2) pair enumeration)."""
    from collections import Counter

    ids = sorted(labels_a)
    assert sorted(labels_b) == ids
    cont: Counter = Counter((labels_a[i], labels_b[i]) for i in ids)
    a_sizes: Counter = Counter(labels_a.values())
    b_sizes: Counter = Counter(labels_b.values())

    def c2(n: int) -> int:
        return n * (n - 1) // 2

    tp = sum(c2(n) for n in cont.values())
    pa = sum(c2(n) for n in a_sizes.values())  # pairs together in A
    pb = sum(c2(n) for n in b_sizes.values())  # pairs together in B
    if pa == 0 or pb == 0:
        return 1.0
    precision = tp / pb
    recall = tp / pa
    return 2 * precision * recall / (precision + recall) if tp else 0.0
