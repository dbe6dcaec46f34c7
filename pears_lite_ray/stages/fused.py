"""Fused extract+tokenize actor stage.

One actor pool instead of two: html bytes in → tokenized doc rows out.
Fusing removes the intermediate (url, text, …) exchange through the object
store — the extracted text is the largest intermediate column in the build
and never needs to leave the worker — and halves actor-startup cost, which
dominates small-corpus builds (per-doc UDF time is ~0.6 ms; two 15-actor
pools cost seconds of spawn+import per wave).

The per-stage classes (ExtractStage / TokenizeStage) remain the unit of
testing and of the PassthroughExtract path; this class composes their
logic, state built once per actor in ``__init__`` (SURVEY §2.4 T1/T2).
"""

from __future__ import annotations

import pyarrow as pa

from .extract import ExtractStage, PassthroughExtract
from .tokenize import TokenizeStage


class FusedExtractTokenize:
    def __init__(self, vocab_path: str | None, kind: str = "spm",
                 installed_languages: tuple[str, ...] = ("en",),
                 mode: str = "html"):
        self.extract = (
            ExtractStage(installed_languages=installed_languages)
            if mode == "html" else PassthroughExtract()
        )
        self.tokenize = TokenizeStage(vocab_path, kind=kind, drop_text=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.tokenize(self.extract(batch))
