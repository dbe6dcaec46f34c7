"""Vocabulary + tokenizers.

Two tokenizers:

* :class:`SpmTokenizer` — SentencePiece **unigram** segmentation reimplemented
  as word-level Viterbi over the plain-text vocab (piece, logprob). The
  reference loads the binary SPM model per call (``mk_page_vector.py:21-26``:
  lowercase, then ``encode_as_pieces``); we cannot load the protobuf without
  the sentencepiece lib, but the unigram Viterbi over the published (piece,
  logprob) table reproduces ``encode_as_pieces`` for a unigram model. Because
  no piece in the vocab contains ``▁`` past position 0 (verified), optimal
  segmentations never cross word boundaries, so per-word memoized Viterbi is
  exact and fast.
* :class:`RegexTokenizer` — plain ``[a-z0-9]+`` word tokenizer, used by the
  SQL-oracle-checked pipelines (DuckDB can reproduce it with
  ``regexp_split_to_array``).

Vocab parse mirrors the reference's reader semantics
(``app/readers.py:2-19``): duplicate or empty pieces are skipped, ids are
dense in file order, and the stored per-piece weight is the *negated*
logprob (so weights are positive costs); document vectors weight counts by
``weight**5`` (``mk_page_vector.py:30``).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"[a-z0-9]+")

SPACE_PIECE = "▁"  # ▁


class Vocab:
    """Piece → id map with unigram logprobs (reference: app/readers.py:2-19)."""

    def __init__(self, pieces: list[str], logprobs: list[float]):
        self.piece_to_id: dict[str, int] = {}
        self.pieces: list[str] = []
        self.logprob: list[float] = []  # original (negative) logprobs
        for p, lp in zip(pieces, logprobs):
            if p == "" or p in self.piece_to_id:
                continue
            self.piece_to_id[p] = len(self.pieces)
            self.pieces.append(p)
            self.logprob.append(lp)
        # positive costs, as the reference stores them (readers.py:12)
        self.weight = np.array([-lp for lp in self.logprob], dtype=np.float64)
        self.size = len(self.pieces)
        self.max_piece_len = max((len(p) for p in self.pieces), default=1)

    @classmethod
    def load(cls, path: str) -> "Vocab":
        pieces, lps = [], []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split("\t")
                pieces.append(parts[0])
                lps.append(float(parts[1]) if len(parts) > 1 else 0.0)
        return cls(pieces, lps)

    def get(self, piece: str) -> int | None:
        return self.piece_to_id.get(piece)


class SpmTokenizer:
    """Unigram-LM Viterbi segmentation over a :class:`Vocab`.

    ``__call__`` mirrors the reference's ``tokenize_text``
    (``mk_page_vector.py:21-26``): lowercase first, then segment; the result
    is the list of surface pieces (first piece of each word carries the ``▁``
    prefix). Unknown characters surface as single-char pieces scored with the
    standard SentencePiece unk penalty (min score − 10).
    """

    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        # piece score table for Viterbi substring probes: max_len dict
        # lookups per position instead of scanning every piece that shares
        # the first character (half the vocab starts with '▁' — the scan
        # cost ~2.6 ms per novel word, the probe ~20 µs, same candidates)
        self._score: dict[str, float] = {
            p: vocab.logprob[i] for p, i in vocab.piece_to_id.items()
        }
        self.max_len = vocab.max_piece_len
        self.unk_score = min(vocab.logprob, default=0.0) - 10.0
        # memoized word segmentation (words repeat heavily in web text)
        self._segment_word = lru_cache(maxsize=262144)(self._segment_word_impl)

    def _segment_word_impl(self, word: str) -> tuple[str, ...]:
        """Viterbi over ``▁word`` (dummy-prefix convention)."""
        s = SPACE_PIECE + word
        n = len(s)
        neg_inf = float("-inf")
        best = [neg_inf] * (n + 1)
        best[0] = 0.0
        back: list[tuple[int, str] | None] = [None] * (n + 1)
        score_of = self._score.get
        max_len = self.max_len
        for i in range(n):
            bi = best[i]
            if bi == neg_inf:
                continue
            matched = False
            for j in range(i + 1, min(n, i + max_len) + 1):
                score = score_of(s[i:j])
                if score is not None:
                    matched = True
                    sc = bi + score
                    if sc > best[j]:
                        best[j] = sc
                        back[j] = (i, s[i:j])
            # unk fallback: always allow a single-char step so segmentation
            # never fails; scored below any real piece.
            if not matched or best[i + 1] == neg_inf:
                sc = bi + self.unk_score
                if sc > best[i + 1]:
                    best[i + 1] = sc
                    back[i + 1] = (i, s[i])
        out: list[str] = []
        j = n
        while j > 0:
            i, piece = back[j]  # type: ignore[misc]
            out.append(piece)
            j = i
        out.reverse()
        return tuple(out)

    def encode_pieces(self, text: str) -> list[str]:
        """Lowercase + segment; concatenation of per-word Viterbi outputs."""
        pieces: list[str] = []
        for word in _WS_RE.split(text.lower()):
            if word:
                pieces.extend(self._segment_word(word))
        return pieces

    def encode_ids(self, text: str) -> list[int]:
        """Known-piece ids only (reference drops OOV pieces: posix.py:21-22)."""
        get = self.vocab.piece_to_id.get
        out = []
        for p in self.encode_pieces(text):
            i = get(p)
            if i is not None:
                out.append(i)
        return out

    def encode_ids_positions(self, text: str) -> tuple[list[int], list[int]]:
        """(term_ids, wordpiece positions), positions counted over ALL pieces
        including OOV ones — mirrors ``posix_doc`` (posix.py:17-28), which
        enumerates positions before skipping OOV pieces."""
        get = self.vocab.piece_to_id.get
        ids, pos = [], []
        for k, p in enumerate(self.encode_pieces(text)):
            i = get(p)
            if i is not None:
                ids.append(i)
                pos.append(k)
        return ids, pos

    def __call__(self, text: str) -> str:
        """Space-joined pieces, as the reference returns (mk_page_vector.py:26)."""
        return " ".join(self.encode_pieces(text))


_M64 = (1 << 64) - 1


def term_hash_id(word: str) -> int:
    """Deterministic 63-bit term id from the word's bytes (vocab-free):
    FNV-1a (64-bit) avalanched by the splitmix64 finalizer, top bit cleared.

    Both halves have tested DuckDB replicas (``common.sql_fnv1a`` /
    ``sql_mix64``), so oracles can reproduce term_id-derived values — the
    pods centroid buckets (``term_id % CENTROID_DIM``) in particular; the
    finalizer gives the LOW bits (which the bucketing uses) full avalanche,
    which raw FNV-1a of short words lacks. (Was blake2b-63 through r4 —
    not SQL-expressible, which kept pods_route rows-only.)"""
    h = 0xCBF29CE484222325
    for b in word.encode():
        h = ((h ^ b) * 0x100000001B3) & _M64
    h ^= h >> 30
    h = (h * 0xBF58476D1CE4E5B9) & _M64
    h ^= h >> 27
    h = (h * 0x94D049BB133111EB) & _M64
    h ^= h >> 31
    return h & ((1 << 63) - 1)


class RegexTokenizer:
    """Lowercase ``[a-z0-9]+`` word tokenizer; term ids are word hashes.

    Vocab-free (term_id = blake2b-63bit of the word), so a distributed build
    needs no global vocabulary pass; DuckDB reproduces the tokenization with
    ``regexp_split_to_array(lower(text),'[^a-z0-9]+')``. Word-id lookups are
    memoized per instance.
    """

    def __init__(self):
        self._id = lru_cache(maxsize=262144)(term_hash_id)

    def encode_pieces(self, text: str) -> list[str]:
        return _WORD_RE.findall(text.lower())

    def encode_ids_positions(self, text: str) -> tuple[list[int], list[int]]:
        words = self.encode_pieces(text)
        return [self._id(w) for w in words], list(range(len(words)))

    def __call__(self, text: str) -> str:
        return " ".join(self.encode_pieces(text))


def make_tokenizer(kind: str, vocab: Vocab | None):
    if kind == "spm":
        if vocab is None:
            raise ValueError("spm tokenizer requires a vocab")
        return SpmTokenizer(vocab)
    if kind == "regex":
        return RegexTokenizer()
    raise ValueError(f"unknown tokenizer kind: {kind}")
