"""Batch text embedding (reference S3/S4/Q1: `add`/`search` with a model).

The reference embeds with fastembed's BAAI/bge-small-en-v1.5 (384-dim,
/root/reference/src/db.rs:102-114, README.md:57). Two backends share one
Arrow-batched pandas_udf contract:

- ``hash`` (default): a deterministic feature-hashing bag-of-tokens
  encoder — each lowercased token md5-hashes to a dimension and a sign,
  the vector is L2-normalized. No model weights, oracle-replayable, the
  test/CI default.
- ``model:<name>`` (env ``VICTOR_SPARK_EMBEDDER``, e.g.
  ``model:BAAI/bge-small-en-v1.5``): a real embedding model via
  sentence-transformers or fastembed (whichever is installed — fastembed
  is what the reference links). The model loads lazily ONCE PER EXECUTOR
  PROCESS (module-level cache keyed by name — Spark reuses the Python
  worker across batches) and encodes whole Arrow batches, which is the
  production shape: weights ship once, batches amortize the call.

``set_backend`` registers a custom encode callable behind the same seam
(how the tests prove the plumbing without model weights in the container).

Why pandas_udf here and nowhere else: an embedding model is genuinely
Python (ONNX/torch); Arrow batching amortizes the transfer, and at scale
this runs one model instance per executor core over 10k-row batches.
"""

from __future__ import annotations

import hashlib
import math
import os
from typing import Callable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64
EMBEDDER_ENV = "VICTOR_SPARK_EMBEDDER"

# explicit override installed by set_backend(); (encode, dim) or None.
# encode: list[str] -> list[list[float]] and must be picklable (it ships
# to executors inside the udf closure).
_CUSTOM: Optional[tuple[Callable[[list[str]], list[list[float]]], int]] = None

# executor-side lazy model cache (one real model per worker process)
_MODEL_CACHE: dict[str, object] = {}


def set_backend(encode: Optional[Callable[[list[str]], list[list[float]]]],
                dim: int = DEFAULT_DIM) -> None:
    """Install (or with None, clear) a custom embedding backend."""
    global _CUSTOM
    _CUSTOM = None if encode is None else (encode, dim)


def backend_spec() -> tuple[str, Optional[str], int]:
    """(kind, model_name, dim) for the active backend: kind is 'custom',
    'model', or 'hash'."""
    if _CUSTOM is not None:
        return "custom", None, _CUSTOM[1]
    env = os.environ.get(EMBEDDER_ENV, "").strip()
    if env.startswith("model:"):
        return "model", env[len("model:"):], -1  # dim set by the model
    return "hash", None, DEFAULT_DIM


def _load_real_model(name: str):
    """Executor-side lazy load: sentence-transformers, else fastembed (the
    reference's library). Raises ImportError naming both if neither is
    installed."""
    m = _MODEL_CACHE.get(name)
    if m is not None:
        return m
    try:
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(name)

        def _enc(texts: list[str]) -> list[list[float]]:
            return model.encode(texts, normalize_embeddings=True).tolist()

    except ImportError:
        try:
            from fastembed import TextEmbedding

            model = TextEmbedding(model_name=name)

            def _enc(texts: list[str]) -> list[list[float]]:
                return [list(map(float, v)) for v in model.embed(texts)]

        except ImportError as exc:
            raise ImportError(
                f"{EMBEDDER_ENV} requests model {name!r} but neither "
                "sentence-transformers nor fastembed is installed"
            ) from exc
    _MODEL_CACHE[name] = _enc
    return _enc


def _embed_one(text: str, dim: int) -> list[float]:
    # split on ' ' exactly like functions/text.py::tokens and the oracle's
    # string_split — Python's bare .split() eats tabs/newlines too, which
    # silently diverges from every SQL twin (edge-testdata-caught)
    vec = [0.0] * dim
    for tok in (t for t in text.lower().split(" ") if t):
        h = hashlib.md5(tok.encode("utf-8")).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[idx] += sign
    n = math.sqrt(sum(x * x for x in vec))
    if n > 0:
        vec = [x / n for x in vec]
    return vec


# Per-worker token→(dim-index, sign) memo for the hash backend, keyed by
# dim (round-11 optimization, guide §4.2: do the heavy lifting vectorized
# inside the batch). Tokens are Zipf-distributed, so the md5 is computed
# once per DISTINCT token per worker instead of once per occurrence.
# Bounded: past the cap new tokens are hashed without being cached.
_TOKEN_MEMO: dict[int, dict[str, tuple[int, float]]] = {}
_TOKEN_MEMO_MAX = 1 << 20


def _embed_texts(texts: pd.Series, dim: int) -> pd.Series:
    """Batch twin of _embed_one — bit-identical by construction: the ±1.0
    accumulations and the squared-norm sums are exact small integers in
    float64 (order-independent), and sqrt/divide/float32-cast are the same
    IEEE operations the scalar path applies."""
    memo = _TOKEN_MEMO.setdefault(dim, {})
    out = np.zeros((len(texts), dim), dtype=np.float64)
    rows: list[int] = []
    cols: list[int] = []
    signs: list[float] = []
    for i, t in enumerate(texts):
        # split on ' ' exactly like _embed_one (and the SQL twins)
        for tok in (t or "").lower().split(" "):
            if not tok:
                continue
            e = memo.get(tok)
            if e is None:
                h = hashlib.md5(tok.encode("utf-8")).digest()
                e = (int.from_bytes(h[:4], "big") % dim,
                     1.0 if h[4] & 1 else -1.0)
                if len(memo) < _TOKEN_MEMO_MAX:
                    memo[tok] = e
            rows.append(i)
            cols.append(e[0])
            signs.append(e[1])
    np.add.at(out, (rows, cols), signs)
    norms = np.sqrt((out * out).sum(axis=1))
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return pd.Series([r.astype(np.float32) for r in out])


def embed_udf(dim: int = DEFAULT_DIM):
    """pandas_udf: string column → array<float> embedding column, through
    whichever backend is active AT PLAN TIME (the choice is captured into
    the closure, so a running job is unaffected by later env changes)."""
    kind, model_name, custom_dim = backend_spec()

    if kind == "custom":
        encode, _d = _CUSTOM

        @F.pandas_udf(ArrayType(FloatType()))
        def _udf(texts: pd.Series) -> pd.Series:
            vecs = encode([t or "" for t in texts])
            return pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

        return _udf

    if kind == "model":

        @F.pandas_udf(ArrayType(FloatType()))
        def _udf(texts: pd.Series) -> pd.Series:
            enc = _load_real_model(model_name)
            vecs = enc([t or "" for t in texts])
            return pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

        return _udf

    @F.pandas_udf(ArrayType(FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return _embed_texts(texts, dim)

    return _udf


def embed(col: Column | str, dim: int = DEFAULT_DIM) -> Column:
    return embed_udf(dim)(F.col(col) if isinstance(col, str) else col)


def embed_query(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Driver-side single-string embedding (reference Q1 search path,
    db.rs:198-213 — one query string, embedded before the scan), through
    the same backend as the batch path."""
    kind, model_name, _d = backend_spec()
    if kind == "custom":
        return [float(x) for x in _CUSTOM[0]([text])[0]]
    if kind == "model":
        return [float(x) for x in _load_real_model(model_name)([text])[0]]
    return _embed_one(text, dim)
