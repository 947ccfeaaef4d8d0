"""Unicode normalization for corpus text — the canonicalization step that
makes fingerprints/dedup keys robust to byte-different-but-equivalent
encodings (decomposed vs precomposed accents, fullwidth forms, etc.).

Spark has no built-in Unicode normalizer, so this is one of the few
legitimately Python stages: an Arrow-batched pandas UDF over
``unicodedata.normalize`` (per-element C call inside the batch — same
budget class as the HTML extractor, far from the per-row-Python
anti-pattern the guards forbid). The DuckDB oracle replays NFC exactly
via its ``nfc_normalize`` (utf8proc), which the driver check exploits:
two independent Unicode implementations must agree byte-for-byte on the
corpus.

Typical composition: ``nfc_text`` BEFORE ``textstats.fingerprint`` so
"café" (e + combining acute) and "café" (precomposed) dedup together.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _make_normalizer(form: str):
    @F.pandas_udf(T.StringType())
    def norm(text: pd.Series) -> pd.Series:
        return text.map(
            lambda s: None if s is None else unicodedata.normalize(form, s)
        )

    return norm


_NFC = _make_normalizer("NFC")
_NFKC = _make_normalizer("NFKC")


def nfc_text(col: Column) -> Column:
    """Canonical composition (NFC): equivalent sequences -> one byte form.
    The right default for dedup keys — visually identical text compares
    equal, no information is lost."""
    return _NFC(col)


def nfkc_text(col: Column) -> Column:
    """Compatibility composition (NFKC): additionally folds fullwidth
    forms, ligatures, superscripts. Lossy (ﬁ -> fi); use for search keys,
    not for stored text."""
    return _NFKC(col)
