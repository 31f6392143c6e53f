"""Grounder scan microbenchmark (round-3 VERDICT wrong #2 / next #2).

Compares the token-indexed longest-match scanner against the legacy
``re`` alternation at 1x, 10x and 100x lexicon size on identical text.
The alternation costs O(|lexicon|) attempts per scan position, the
token scan O(1) dict probes per token — the gap should widen with
lexicon size while annotations stay identical.

Usage: python tools/bench_grounder.py
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")

from outbreak_kg_ray.stages.ner import DEFAULT_LEXICON, LexicalGrounder


def make_lexicon(mult: int):
    syn = [
        ("MESH", f"DS{mult}_{k:05d}", f"synthitis{mult} {k:05d}")
        for k in range((mult - 1) * len(DEFAULT_LEXICON))
    ]
    return list(DEFAULT_LEXICON) + syn


def make_texts(names, n_texts=200, words=120, seed=11):
    rng = random.Random(seed)
    noise = ["the", "of", "outbreak", "cases", "reported", "province",
             "hospital", "confirmed", "samples", "2024", "district"]
    texts = []
    for _ in range(n_texts):
        parts = []
        for _ in range(words):
            if rng.random() < 0.12:
                parts.append(rng.choice(names))
            else:
                parts.append(rng.choice(noise))
        texts.append(" ".join(parts))
    return texts


def run(g: LexicalGrounder, texts, fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = 0
    for t in texts:
        n += len(fn(t))
    return time.perf_counter() - t0, n


def main() -> None:
    base_names = [n for _, _, n in DEFAULT_LEXICON]
    texts = make_texts(base_names)
    print(f"{'lexicon':>8} {'token-scan':>11} {'alternation':>12} "
          f"{'speedup':>8}  matches-equal")
    for mult in (1, 10, 100):
        lex = make_lexicon(mult)
        g = LexicalGrounder(lex)
        assert g._token_scan_ok
        # warm both paths (regex compile is lazy on the fallback)
        g.annotate(texts[0]); g._annotate_regex(texts[0])
        ts, n1 = run(g, texts, g.annotate)
        tr, n2 = run(g, texts, g._annotate_regex)
        same = all(g.annotate(t) == g._annotate_regex(t) for t in texts[:25])
        print(f"{len(lex):>8} {ts:>10.3f}s {tr:>11.3f}s "
              f"{tr / ts:>7.1f}x  {n1 == n2 and same}")


if __name__ == "__main__":
    main()
