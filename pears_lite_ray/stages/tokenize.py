"""Tokenization stage (actor pool; SURVEY §2.3 M4, §2.4 T1).

The reference reloads the SentencePiece model from disk on **every call**
(``mk_page_vector.py:21-26``); here the tokenizer (Viterbi trie over the 16k
vocab) is built once per actor in ``__init__`` and amortized across batches.

Output adds to each doc row: ``term_ids:list<int64>`` (known-vocab pieces in
order), ``positions:list<int32>`` (wordpiece positions counted over ALL
pieces incl. OOV — mirrors posix_doc, posix.py:17-28) and ``doclen:int32``
(= number of known pieces, the BM25 document length).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..vocab import Vocab, make_tokenizer


class TokenizeStage:
    def __init__(self, vocab_path: str | None, kind: str = "spm", drop_text: bool = True):
        self.vocab = Vocab.load(vocab_path) if kind == "spm" else None
        self.tokenizer = make_tokenizer(kind, self.vocab)
        self.drop_text = drop_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids_offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        ids_parts, pos_parts = [], []
        for i, text in enumerate(texts):
            ids, pos = self.tokenizer.encode_ids_positions(text)
            ids_parts.append(np.asarray(ids, dtype=np.int64))
            pos_parts.append(np.asarray(pos, dtype=np.int32))
            ids_offsets[i + 1] = ids_offsets[i] + len(ids)
        flat_ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
        flat_pos = np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int32)
        offsets = pa.array(ids_offsets, pa.int32())
        term_ids = pa.ListArray.from_arrays(offsets, pa.array(flat_ids, pa.int64()))
        positions = pa.ListArray.from_arrays(offsets, pa.array(flat_pos, pa.int32()))
        doclen = pa.array(np.diff(ids_offsets).astype(np.int32), pa.int32())
        out = batch
        if self.drop_text:
            out = out.drop_columns(["text"])
        return (
            out.append_column("term_ids", term_ids)
            .append_column("positions", positions)
            .append_column("doclen", doclen)
        )
