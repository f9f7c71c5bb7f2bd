"""Batch text embedding (reference S3/S4/Q1: `add`/`search` with a model).

The reference embeds with fastembed's BAAI/bge-small-en-v1.5 (384-dim,
/root/reference/src/db.rs:102-114, README.md:57). That model isn't in this
container, so the default embedder is a deterministic feature-hashing
bag-of-tokens encoder: each lowercased token hashes (md5) to a dimension
and a sign, the vector is L2-normalized. Same Arrow-batched pandas_udf
contract a real sentence-transformers model would use — swap `_embed_texts`
for the model call and nothing else changes.

Why pandas_udf here and nowhere else: an embedding model is genuinely
Python (ONNX/torch); Arrow batching amortizes the transfer, and at scale
this runs one model instance per executor core over 10k-row batches.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64


def _embed_one(text: str, dim: int) -> list[float]:
    vec = [0.0] * dim
    for tok in text.lower().split():
        h = hashlib.md5(tok.encode("utf-8")).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[idx] += sign
    n = math.sqrt(sum(x * x for x in vec))
    if n > 0:
        vec = [x / n for x in vec]
    return vec


def _embed_texts(texts: pd.Series, dim: int) -> pd.Series:
    # model seam: a real deployment replaces this loop with one batched
    # model.encode(texts.tolist()) call
    return pd.Series([np.asarray(_embed_one(t or "", dim), dtype=np.float32) for t in texts])


def embed_udf(dim: int = DEFAULT_DIM):
    """pandas_udf: string column → array<float> embedding column."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return _embed_texts(texts, dim)

    return _udf


def embed(col: Column | str, dim: int = DEFAULT_DIM) -> Column:
    return embed_udf(dim)(F.col(col) if isinstance(col, str) else col)


def embed_query(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Driver-side single-string embedding (reference Q1 search path,
    db.rs:198-213 — one query string, embedded before the scan)."""
    return _embed_one(text, dim)
