"""Distributed BPE tokenization: train on a bounded deterministic sample,
apply everywhere.

The engine already computes the merge-step STATISTIC (textstats.bpe_pair_stats,
the Sennrich et al. 2016 pair census); this module closes the loop into a
working tokenizer:

- ``bpe_train``: classic character-level BPE over word-TYPE frequencies
  (operating on the type dict, not the corpus — the standard trick that
  makes training cost |vocab| * n_merges, independent of corpus size).
- ``bpe_encode``: apply the learned merge table to every document,
  distributed (mapInPandas), emitting int32 token ids ready for the
  engine's encode pipeline (the tokens-table shape of BASELINE.json).

100 TB shape: training reads a DETERMINISTIC md5-bucket sample (the same
device as pipeline.stratified_sample — no RNG, no sort, reproducible under
retries), collects only word-type frequencies (Heaps-law bounded, ~10^6
types for a 10^4-doc sample), and the driver runs the merge loop on that
dict. Application is embarrassingly parallel: the merge table (n_merges
rows) broadcasts in the task closure, each worker memoizes word→pieces per
batch (Zipf makes the memo hit rate ~99%), and no shuffle touches the data
path. This train-on-sample / apply-everywhere split is how production
tokenizers are actually built at corpus scale.

Per-word python loops are acceptable here by the same rule that keeps the
codec kernels numpy-only: tokenization is string-domain work outside the
codec hot path, and the word memo keeps the loop on TYPES, not tokens.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# End-of-word marker: the UNIT SEPARATOR control character, not a literal
# like "</w>" — text that CONTAINS the marker substring would detokenize
# to the wrong string ("</w>" is entirely plausible in web/markup corpora;
# \x1f essentially never appears, and it is not regex whitespace, so the
# normalization contract below is untouched).
END = "\x1f"
UNK = "<unk>"

# Pre-tokenization splits on EXACTLY the regex-\s class ([ \t\n\r\f\v]) of
# RE2/Java — NOT python str.split(), whose str.isspace() set also swallows
# \x1c-\x1e, \x85 and \xa0 and would silently diverge from the SQL oracle's
# regexp_replace(text, '\s+', ' ') on such corpora.
_WS = re.compile(r"[ \t\n\r\f\v]+")


def _words_of(text: str | None) -> list[str]:
    return [w for w in _WS.split(text or "") if w]


def _word_freqs_from_texts(texts) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        for w in _words_of(t):
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def bpe_train(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning (Sennrich et al. 2016, alg. 1) over word
    types: each round counts adjacent symbol pairs weighted by word
    frequency and merges the most frequent, ties broken lexicographically
    so the merge table is a pure function of the input dict."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], c) for w, c in sorted(word_freqs.items())
    ]
    # incremental trainer (the standard inverted-index optimization): pair
    # counts and a pair -> word-ids index are maintained across rounds, so
    # each merge touches only the words that contain it — round cost is
    # proportional to the merged pair's support, not the whole type dict
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, c) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + c
            where.setdefault((a, b), set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        pair, best_c = max(
            counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1])
        )
        if best_c < 2:
            break  # nothing left worth merging
        merges.append(pair)
        ab = pair[0] + pair[1]
        for wi in sorted(where.pop(pair, ())):
            syms, c = words[wi]
            if pair[0] not in syms:  # stale index entry
                continue
            # retract this word's old pair counts, merge, re-add the new
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) - c
                if counts[p] <= 0:
                    counts.pop(p, None)
            i = 0
            while i < len(syms) - 1:
                if syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + c
                where.setdefault(p, set()).add(wi)
        counts.pop(pair, None)
    return merges


def _apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Merge loop for one word: repeatedly merge the best-ranked adjacent
    pair (the exact inference rule of the trained tokenizer)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_vocab(
    word_freqs: dict[str, int],
    merges: list[tuple[str, str]],
    extra_chars=(),
) -> dict[str, int]:
    """Piece→id table: every symbol reachable from the training sample
    (base characters, END, every merge product) in sorted order, with UNK
    at id 0 for apply-time characters the sample never saw.
    ``extra_chars`` (e.g. corpus_chars) extends the base-character tier so
    a sampled trainer still covers the full corpus alphabet — zero OOV."""
    pieces = {UNK, END}
    for w in word_freqs:
        pieces.update(w)
    pieces.update(extra_chars)
    pieces.update(a + b for a, b in merges)
    return {p: i for i, p in enumerate([UNK] + sorted(pieces - {UNK}))}


def corpus_chars(docs: DataFrame) -> set[str]:
    """The corpus' distinct characters — one partial-aggregated pass whose
    result is alphabet-sized, so collecting it is cheap at any corpus
    size. Feeding it to bpe_vocab makes a SAMPLED trainer OOV-free: rare
    characters outside the sample still tokenize (as single-char pieces)
    instead of collapsing to UNK."""
    rows = (
        docs.select(F.explode(F.split(F.col("text"), "")).alias("c"))
        .where(F.col("c") != "")
        .distinct()
        .collect()
    )
    return {r["c"] for r in rows}


def _piece_array(vocab: dict[str, int]):
    """Literal id-indexed piece lookup array (vocab ids are dense 0..N-1) —
    the single place the dense-id invariant is relied on."""
    id2piece = {i: p for p, i in vocab.items()}
    return F.array(*[F.lit(id2piece[i]) for i in sorted(id2piece)])


def sample_word_freqs(
    spark: SparkSession, docs: DataFrame, max_docs: int = 4096
) -> dict[str, int]:
    """Word-type frequencies of a deterministic md5-bucket sample of
    ``docs`` (same selection device as pipeline.stratified_sample: stable
    under retries and executor count, no sort, no RNG). The collect is
    bounded by the sample size, never the corpus."""
    n = docs.count()
    if n <= max_docs:
        chosen = docs
    else:
        # keep ~max_docs docs: md5 bucket over 1e6 cells
        thresh = int(1_000_000 * max_docs / n)
        chosen = docs.filter(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 1_000_000
            < thresh
        )
        if chosen.limit(1).count() == 0:  # degenerate tiny thresholds
            chosen = docs.orderBy("doc_id").limit(max_docs)
    texts = [r["text"] for r in chosen.select("text").collect()]
    return _word_freqs_from_texts(texts)


def bpe_encode(
    spark: SparkSession,
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
) -> DataFrame:
    """Apply a trained merge table to every document, distributed:
    (doc_id, tokens array<int>, n_tok, n_unk). The merge table and vocab
    ride the task closure (broadcast-sized: n_merges + |vocab| entries);
    each worker memoizes word→ids across its batch."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    unk_id = vocab[UNK]

    def gen(pdfs):
        memo: dict[str, list[int]] = {}
        for pdf in pdfs:
            out_ids, out_n, out_unk = [], [], []
            for text in pdf["text"]:
                ids: list[int] = []
                for w in _words_of(text):
                    got = memo.get(w)
                    if got is None:
                        got = [
                            vocab.get(p, unk_id) for p in _apply_word(w, ranks)
                        ]
                        memo[w] = got
                    ids.extend(got)
                out_ids.append(ids)
                out_n.append(len(ids))
                out_unk.append(sum(1 for i in ids if i == unk_id))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": out_ids,
                    "n_tok": out_n,
                    "n_unk": out_unk,
                }
            )

    id_t = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "text").mapInPandas(
        gen, f"doc_id {id_t}, tokens array<int>, n_tok int, n_unk int"
    )


def bpe_detokenize(enc: DataFrame, vocab: dict[str, int]) -> DataFrame:
    """(doc_id, text) back from token ids — pure JVM projection: an
    id-indexed literal piece array, element_at per token, concat, and the
    end-of-word markers become spaces. The inverse proves the tokenizer
    lossless (modulo whitespace normalization, which the split in
    bpe_encode already collapsed; a document CONTAINING the \\x1f marker
    character itself would detokenize it as a space — the one accepted
    encoding-domain collision, chosen precisely because \\x1f never
    occurs in text)."""
    piece_arr = _piece_array(vocab)
    return enc.select(
        "doc_id",
        F.trim(
            F.replace(
                F.concat_ws(
                    "",
                    F.transform(
                        F.col("tokens"),
                        lambda t: F.element_at(piece_arr, t + F.lit(1)),
                    ),
                ),
                F.lit(END),
                F.lit(" "),
            )
        ).alias("text"),
    )


def bpe_roundtrip_documents(
    spark: SparkSession, sf_dir: str, n_merges: int = 120
) -> DataFrame:
    """Driver query with an EXACT oracle: tokenize every document and
    detokenize it back. Losslessness makes the result equal to the
    whitespace-normalized input, which plain SQL can compute — so the
    whole train→encode→decode loop is value-hash-checked against DuckDB,
    the same 'decoded values bit-identical' contract the codec pipeline
    lives under (reference README.md:93-95). The vocab unions the CORPUS
    character inventory (corpus_chars — alphabet-sized), so a sampled
    trainer still tokenizes every document with zero OOV; losslessness
    therefore holds at any corpus size, not just when the sample covers
    the alphabet by luck."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    freqs = sample_word_freqs(spark, docs)
    merges = bpe_train(freqs, n_merges)
    vocab = bpe_vocab(freqs, merges, extra_chars=corpus_chars(docs))
    out = bpe_detokenize(bpe_encode(spark, docs, merges, vocab), vocab)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "text")


def bpe_encode_documents(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = 200,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Driver query: train BPE on the documents sample, tokenize every
    document, and emit a hashable per-doc summary (the driver
    canonicalizer cannot hash array columns): piece count, OOV count, and
    the first pieces rendered as text. Deterministic end to end — the
    sample is md5-selected and the trainer tie-breaks lexicographically —
    but the merge loop itself has no SQL twin, so this entry is rows-only
    by design (like the engine-internal codec metrics views)."""
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    freqs = sample_word_freqs(spark, docs)
    merges = bpe_train(freqs, n_merges)
    vocab = bpe_vocab(freqs, merges)
    enc = bpe_encode(spark, docs, merges, vocab)
    piece_expr = _piece_array(vocab)
    return enc.select(
        "doc_id",
        "n_tok",
        "n_unk",
        F.concat_ws(
            " ",
            F.transform(
                F.slice(F.col("tokens"), 1, 12),
                lambda t: F.element_at(piece_expr, t + F.lit(1)),
            ),
        ).alias("pieces_head"),
    )
