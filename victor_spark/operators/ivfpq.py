"""IVF-PQ: inverted-file cells + product-quantized residuals — the
FAISS-standard composition of the catalog's two ANN index structures, and
the configuration actually deployed for billion-vector corpora.

Why residuals: within a cell, vectors cluster around the centroid, so
PQ-encoding (v − centroid) spends the codebook's resolution on the small
in-cell offsets instead of the global spread — better recall at the same
m bytes/vector.

Query path at 100 TB: score the centroids (tiny), pick nprobe cells —
with the corpus persisted `partitionBy("cell")` that is literal directory
pruning — then ADC-scan ONLY the probed cells' code columns with a
per-cell lookup table built from the query's residual against that cell.
No float vectors are read at query time; the scan is m bytes/vector over
nprobe/n_cells of the data.

Determinism (oracle-checkable): centroids are the every-``centroid_mod``-th
vectors, the residual codebook rows are the ``k_cb`` smallest salted-md5
ids (both standing in for k-means, same seam as ivf/pq), and every argmax
breaks ties by (score desc, id asc). All model artifacts come back in ONE
driver collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from victor_spark.functions import hashing as H
from victor_spark.functions.vector import bind, cosine
from victor_spark.operators import pq as PQ


def collect_ivfpq_model(df: DataFrame, id_col: str, vec_col: str,
                        query_id, k_cb: int = 16, centroid_mod: int = 250,
                        salt: str = "pq"):
    """One driver round trip for every model artifact: centroid rows,
    residual-codebook source rows, and the query vector.

    Returns (centroids: {cell: vec}, codebook: list[residual vec] ordered
    by source id, query: vec)."""
    tagged = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn(
        "_h", H.md5_32(F.concat(F.lit(salt + ":"), F.col("_id").cast("string")))
    )
    cent = tagged.filter(F.col("_id") % centroid_mod == 0).select(
        "_id", "_v", F.lit("cent").alias("_part")
    )
    cb = tagged.orderBy("_h", "_id").limit(k_cb).select(
        "_id", "_v", F.lit("cb").alias("_part")
    )
    q = tagged.filter(F.col("_id") == query_id).select(
        "_id", "_v", F.lit("q").alias("_part")
    )
    rows = cent.unionAll(cb).unionAll(q).collect()
    centroids = {
        int(r["_id"]): [float(x) for x in r["_v"]]
        for r in rows if r["_part"] == "cent"
    }
    q_rows = [r for r in rows if r["_part"] == "q"]
    if not q_rows:
        raise ValueError(f"query id {query_id!r} not found")
    query = [float(x) for x in q_rows[0]["_v"]]
    cb_rows = sorted(
        (r for r in rows if r["_part"] == "cb"), key=lambda r: r["_id"]
    )
    codebook = [
        _residual([float(x) for x in r["_v"]], centroids) for r in cb_rows
    ]
    return centroids, codebook, query


def _cosine(a: list[float], b: list[float]) -> float:
    # zero-norm guard matches index.py's _cos: a zero vector sorts last
    # instead of raising ZeroDivisionError during model collection
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0.0 or nb == 0.0:
        return float("-inf")
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


def _nearest_cell(v: list[float], centroids: dict) -> int:
    # (cosine desc, cell asc) — the same tie-break the executors use
    return min(centroids.items(), key=lambda kv: (-_cosine(v, kv[1]), kv[0]))[0]


def _residual(v: list[float], centroids: dict) -> list[float]:
    cv = centroids[_nearest_cell(v, centroids)]
    return [x - c for x, c in zip(v, cv)]


def assign_cells(df: DataFrame, id_col: str, vec_col: str,
                 centroids: dict) -> DataFrame:
    """(id, vec, cell): nearest centroid by cosine, as a MAP-SIDE fold —
    at scale this is the partitioning job that writes partitionBy('cell').

    The centroid dict is a collected model artifact (the caller already
    holds it driver-side), so assignment bakes it into the plan as a
    literal array and picks each row's argmax with a per-row ``aggregate``
    fold — zero exchanges, no k-fold row inflation (round-11 optimization,
    the semantic_dedup precedent). The old shape (broadcast crossJoin +
    max_by groupBy) shuffled one row per id purely to run the argmax.

    Fold semantics == ``max_by(cell, struct(cs, -cell))`` exactly: a
    strictly-higher cosine wins; an exactly-equal cosine (incl. NaN ==
    NaN, true under Spark's SQL ordering) wins only with a lower cell id;
    NULL cosines skip (the ``when`` condition is NULL → keep acc), just
    as max_by ignores NULL keys. The same :func:`cosine` helper runs per
    element, so scores are bit-identical to the crossJoin plan's. The
    init sentinel -2.0 sits below any real cosine, and NaN (zero-norm
    rows) compares greater than it under Spark's ordering, so the first
    centroid always replaces the sentinel — no NULL three-valued logic.
    """
    cent_arr = F.array(*[
        F.struct(
            F.lit(int(cell)).cast("long").alias("cell"),
            F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
        )
        for cell, cv in sorted(centroids.items())
    ])
    init = F.struct(
        F.lit(-2.0).alias("cs"), F.lit(-(2 ** 62)).cast("long").alias("cell")
    )
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        bind(
            F.col(vec_col),
            lambda v: F.aggregate(
                cent_arr,
                init,
                lambda acc, c: bind(
                    cosine(v, c["cv"]),
                    lambda cs: F.when(
                        (cs > acc["cs"])
                        | ((cs == acc["cs"]) & (c["cell"] < acc["cell"])),
                        F.struct(cs.alias("cs"), c["cell"].alias("cell")),
                    ).otherwise(acc),
                ),
                lambda a: a["cell"],
            ),
        ).alias("cell"),
    )


def ivfpq_topk(df: DataFrame, id_col: str, vec_col: str, query_id,
               k: int = 5, m: int = 8, k_cb: int = 16, nprobe: int = 2,
               centroid_mod: int = 250, salt: str = "pq",
               model=None, assigned: DataFrame | None = None) -> DataFrame:
    """Top-k by IVF-PQ ADC distance: probe ``nprobe`` cells, score residual
    codes against the query's per-cell residual LUT. Returns
    (id, cell, adc_dist ascending). Pass a precollected
    ``model=(centroids, codebook, query)`` to skip the model-collect job
    when the caller already has it (e.g. the recall audit); pass
    ``assigned`` — an (id_col, vec_col, cell) frame produced by the same
    nearest-centroid rule as :func:`assign_cells` — to share the
    cell-assignment dataflow with a sibling IVF leg instead of paying
    the corpus-wide argmax twice."""
    centroids, codebook, query = model or collect_ivfpq_model(
        df, id_col, vec_col, query_id, k_cb, centroid_mod, salt
    )
    probed = sorted(
        centroids, key=lambda c: (-_cosine(query, centroids[c]), c)
    )[:nprobe]

    if assigned is None:
        assigned = assign_cells(df, id_col, vec_col, centroids)
    cand = assigned.filter(F.col("cell").isin([int(c) for c in probed]))

    # residual = v - centroid[cell]: centroid literal selected by the
    # (already probe-filtered) cell column
    def _resid_bound(v):
        expr = None
        for c in probed:
            cv = F.array(*[F.lit(float(x)) for x in centroids[c]])
            sub = F.zip_with(v, cv, lambda x, y: x - y)
            cond = F.col("cell") == int(c)
            expr = F.when(cond, sub) if expr is None else expr.when(cond, sub)
        return expr

    resid = cand.select(
        F.col(id_col), "cell", bind(F.col(vec_col), _resid_bound).alias("_r")
    )
    enc = PQ.encode(resid, "_r", codebook, m=m)

    # per-cell ADC LUT over the query's residual against that cell
    luts = {
        c: PQ.adc_lut(
            [qx - cx for qx, cx in zip(query, centroids[c])], codebook, m
        )
        for c in probed
    }

    def _score_for(lut):
        lut_lit = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in lut])

        def _s(lut_b):
            score = None
            for j in range(m):
                term = F.element_at(
                    F.element_at(lut_b, j + 1), F.element_at(F.col("pq_code"), j + 1)
                )
                score = term if score is None else score + term
            return score

        return bind(lut_lit, _s)

    score = None
    for c in probed:
        cond = F.col("cell") == int(c)
        s = _score_for(luts[c])
        score = F.when(cond, s) if score is None else score.when(cond, s)

    return (
        enc.select(F.col(id_col), "cell", score.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )
