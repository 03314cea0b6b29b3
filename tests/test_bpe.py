"""Algorithm-level certification of the BPE band: the Spark merge plan must
reproduce a textbook pure-Python BPE trainer (Sennrich et al. 2016) run on
the same corpus — so the DataFrame formulation and the DuckDB oracle are
both checked against the ALGORITHM, not merely against each other (the
q_skyline brute-force pattern). Plus the structural invariants a learned
merge table must satisfy regardless of corpus.
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from iceberg_benchmark_poc_spark.core.registry import all_queries
from iceberg_benchmark_poc_spark.queries.bpe import BPE_EOW, BPE_MERGES

from .conftest import SF_DIR


def _corpus_word_counts() -> dict[str, int]:
    """Whitespace word counts of the test corpus, matching the engine's
    split(trim(text), '\\s+') tokenization."""
    counts: dict[str, int] = {}
    for text in pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).column(0).to_pylist():
        for w in re.split(r"\s+", text.strip()):
            counts[w] = counts.get(w, 0) + 1
    return counts


def _python_bpe(word_counts: dict[str, int], merges: int):
    """Textbook BPE: greedy most-frequent adjacent pair, ties on pair text
    ascending, left-to-right non-overlapping rewrite (the semantics of a
    padded string replace). Returns (merge table rows, final symbol vocab)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        syms = tuple(list(w) + [BPE_EOW])
        vocab[syms] = vocab.get(syms, 0) + c
    table = []
    for r in range(merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (x, y), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        table.append((r, f"{x} {y}", x + y, cnt))
        new: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return table, vocab


def test_bpe_train_matches_textbook_trainer(spark):
    rows = all_queries()["q_bpe_train"].fn(spark, SF_DIR).collect()
    got = sorted((r["merge_rank"], r["pair"], r["merged"], r["pair_count"]) for r in rows)
    expected, _ = _python_bpe(_corpus_word_counts(), BPE_MERGES)
    assert got == sorted(expected)


def test_bpe_encode_matches_textbook_histogram(spark):
    rows = all_queries()["q_bpe_encode"].fn(spark, SF_DIR).collect()
    got = {r["token"]: r["n_occurrences"] for r in rows}
    _, vocab = _python_bpe(_corpus_word_counts(), BPE_MERGES)
    expected: dict[str, int] = {}
    for syms, c in vocab.items():
        for s in syms:
            expected[s] = expected.get(s, 0) + c
    assert got == expected


def test_bpe_encode_conserves_words_and_ranks_are_dense(spark):
    """Corpus-independent invariants: every word occurrence ends in exactly
    one EOW-bearing token, so the EOW-token mass equals the corpus word
    count; and the merge table is dense ranks 0..M-1 with merged = pair
    minus its space and strictly positive support."""
    word_total = sum(_corpus_word_counts().values())
    enc = all_queries()["q_bpe_encode"].fn(spark, SF_DIR).collect()
    eow_mass = sum(r["n_occurrences"] for r in enc if BPE_EOW in r["token"])
    assert eow_mass == word_total

    tr = all_queries()["q_bpe_train"].fn(spark, SF_DIR).collect()
    assert sorted(r["merge_rank"] for r in tr) == list(range(BPE_MERGES))
    for r in tr:
        assert r["merged"] == r["pair"].replace(" ", "")
        assert r["pair_count"] > 0
