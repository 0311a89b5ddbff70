"""From-scratch byte-pair-encoding tokenizer (trained, deterministic).

The SQL-expressible `token_count_bpe_ish` (functions/text.py) is a
length proxy kept for oracle checks; THIS is the real subword path a
token-budget accounting pipeline needs: learn merges from a corpus
sample once (driver-side, deterministic), broadcast the merge table,
and count tokens with a vectorized-dispatch pandas UDF whose per-word
work is memoized (natural-language word frequency follows Zipf, so
the per-worker word cache hits almost always).

Classic BPE (Sennrich et al. 2016, public algorithm): words are
symbol tuples ending in '</w>'; each round merges the most frequent
adjacent pair (ties broken lexicographically — full determinism, no
RNG); encoding applies merges in learned priority order.

Scale shape: training reads a bounded SAMPLE (explicit `limit`), the
merge table is KBs and ships via closure broadcast; counting is
map-only over the corpus — no shuffle anywhere.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

_WORD_RE = re.compile(r"[a-z]+")
_NONALPHA_RE = re.compile(r"[0-9]+|[.,;:!?'\"()\[\]{}<>@#$%^&*+=/\\|~`_-]")
END = "</w>"


def train_bpe(texts, num_merges: int = 200) -> list[tuple[str, str]]:
    """Learn an ordered merge list from an iterable of texts."""
    word_freq: Counter = Counter()
    for t in texts:
        if isinstance(t, str):
            word_freq.update(_WORD_RE.findall(t.lower()))
    symbols = {w: tuple(w) + (END,) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for w, f in word_freq.items():
            sym = symbols[w]
            for i in range(len(sym) - 1):
                pair_counts[(sym[i], sym[i + 1])] += f
        if not pair_counts:
            break
        # max count; ties broken by lexicographically smallest pair
        best_pair, best_n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < 2:
            break
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        for w, sym in symbols.items():
            if best_pair[0] not in sym:
                continue
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best_pair[0] and sym[i + 1] == best_pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            symbols[w] = tuple(out)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one lowercase word, best-rank-first."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = sym[best_i], sym[best_i + 1]
        # merge every occurrence of this pair (left to right)
        out = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def count_tokens_python(text: str, ranks: dict[tuple[str, str], int], cache: dict | None = None) -> int:
    """Single-node reference: BPE tokens for alpha words + one token
    per number/punctuation match (mirrors token_count_bpe_ish's
    non-alpha handling)."""
    if not isinstance(text, str) or not text:
        return 0
    n = 0
    for w in _WORD_RE.findall(text.lower()):
        if cache is not None and w in cache:
            n += cache[w]
        else:
            c = len(encode_word(w, ranks))
            if cache is not None:
                cache[w] = c
            n += c
    n += len(_NONALPHA_RE.findall(text))
    return n


def bpe_count_udf(merges: list[tuple[str, str]]):
    """pandas UDF counting trained-BPE tokens per row. The merge
    table ships in the closure (KBs). Per Arrow batch: tokenize every
    text, encode each UNIQUE word once (through a persistent
    per-worker cache — Zipf makes the hit rate ≈1 on natural text),
    then sum per row from the cache. The only Python loop left runs
    over unique unseen words, not rows."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict[str, int] = {}

    @pandas_udf(IntegerType())
    def _count(texts: pd.Series) -> pd.Series:
        word_lists = [
            _WORD_RE.findall(t.lower()) if isinstance(t, str) else [] for t in texts
        ]
        for w in set().union(*word_lists) if word_lists else ():
            if w not in cache:
                cache[w] = len(encode_word(w, ranks))
        counts = [
            sum(cache[w] for w in wl)
            + (len(_NONALPHA_RE.findall(t)) if isinstance(t, str) else 0)
            for wl, t in zip(word_lists, texts)
        ]
        return pd.Series(counts, index=texts.index, dtype="int32")

    return _count
