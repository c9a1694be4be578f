"""Byte-pair-encoding tokenizer (C4) — a REAL subword tokenizer for
the training-data pipeline, replacing "token counting by regex" with
the algorithm production tokenizers implement (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
same two-stage shape HuggingFace ``tokenizers`` uses).

Shape, and why it scales:

- **Training** operates on the corpus's aggregated WORD-FREQUENCY
  table, never the corpus: a distributed word count (one shuffle,
  vocabulary-bounded by Heaps' law), truncated to the
  ``max_word_types`` most frequent types, collected (bounded rows —
  this is the industry pattern: every real BPE trainer aggregates word
  counts first), then the classic merge loop runs driver-side over
  that bounded table. 100 TB of text changes the word-count stage's
  input size, not the trainer's.
- **Encoding** broadcasts the learned merge ranks and applies the
  greedy lowest-rank merge loop per word inside Arrow-batched
  ``mapInPandas`` with a per-batch word cache (words repeat; the cache
  hit rate is the same Zipf head that makes the trainer tractable).

Determinism: word counts are exact; the trained merges depend only on
them (ties broken by the lexicographically smallest pair), and
encoding is a pure function of (merges, word) — layout- and
engine-independent, so results are golden-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"


def _word_freqs(docs: DataFrame, text_col: str, max_word_types: int) -> list[tuple[str, int]]:
    words = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(int(max_word_types))
        .collect()
    )  # bounded by max_word_types, never by corpus size
    return [(r["w"], r["n"]) for r in words]


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (earlier = higher priority). Deterministic: the
    most frequent adjacent symbol pair wins each round, ties to the
    lexicographically smallest pair."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in _word_freqs(docs, text_col, max_word_types):
        vocab[tuple(w) + (_END,)] = vocab.get(tuple(w) + (_END,), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        ab = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_tokens: int = 8,
) -> DataFrame:
    """Tokenize every document with the learned merges. Output:
    (id, n_bpe_tokens, n_word_types, first_tokens) — the counting +
    fingerprint columns a data pipeline keeps; swap the select for the
    full token array when feeding a trainer. Merge ranks ride the
    closure (broadcast with the task), text crosses Arrow once."""
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    tok_re = re.compile(r"[a-z0-9]+")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            n_toks, n_types, first = [], [], []
            for text in pdf[text_col]:
                words = tok_re.findall(str(text).lower()) if text is not None else []
                toks: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                n_toks.append(len(toks))
                n_types.append(len(set(words)))
                first.append(" ".join(toks[:sample_tokens]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bpe_tokens": pd.Series(n_toks, dtype="int64"),
                    "n_word_types": pd.Series(n_types, dtype="int64"),
                    "first_tokens": first,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_bpe_tokens long, n_word_types long, first_tokens string"
    )
