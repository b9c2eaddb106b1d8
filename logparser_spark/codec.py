"""Token <-> text codec — the pinned encoding contract (FIXTURES.md §1).

Each int32 token is the Unicode code point of one character of the log
line: ``decode(tokens) == ''.join(chr(t) for t in tokens)``. Values are
restricted to printable ASCII 32-126 by the generator, but the decoder
accepts any BMP code point.

The per-row invariant of the whole pipeline ("token-array equality") is
that ``tokens`` passes through parse -> enrich -> route byte-identical
into every sink row; the codec is only ever *read*, never rewritten.

Vectorized implementations: a pandas Series of list[int32] is decoded
batch-at-a-time (no per-row Python beyond the unavoidable join; the
numpy fast path concatenates all tokens of the batch into one array and
decodes a single bytes buffer, then splits by offsets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def encode_text(text: str) -> list[int]:
    """Text -> token array (one code point per character)."""
    return [ord(c) for c in text]


def decode_tokens(tokens) -> str:
    """Token array -> text. Accepts list/ndarray."""
    return "".join(chr(int(t)) for t in tokens)


def decode_series(tokens: pd.Series) -> pd.Series:
    """Vectorized batch decode of a Series of int token arrays.

    Fast path: all-ASCII batches are decoded through one contiguous
    uint8 buffer + offset split — O(total_tokens) numpy work, one
    ``bytes.decode`` per row slice.
    """
    if len(tokens) == 0:
        return pd.Series([], dtype=object)
    arrays = [
        np.asarray(t, dtype=np.int64) if t is not None else np.empty(0, dtype=np.int64)
        for t in tokens
    ]
    lengths = np.fromiter((a.size for a in arrays), dtype=np.int64, count=len(arrays))
    if lengths.sum() == 0:
        return pd.Series([""] * len(tokens), index=tokens.index, dtype=object)
    flat = np.concatenate([a for a in arrays if a.size]) if lengths.sum() else np.empty(0, np.int64)
    if flat.size and flat.min() >= 0 and flat.max() < 128:
        buf = flat.astype(np.uint8).tobytes()
        offsets = np.zeros(len(arrays) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        out = [buf[offsets[i] : offsets[i + 1]].decode("ascii") for i in range(len(arrays))]
    else:
        out = [decode_tokens(a) for a in arrays]
    return pd.Series(out, index=tokens.index, dtype=object)


def encode_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch encode (used by fixture generation)."""
    return texts.map(lambda s: np.frombuffer(s.encode("utf-32-le"), dtype=np.int32).tolist())
