"""Skew-aware join: explicit key salting (extension — the 100 TB lever for
joins AQE can't fix).

AQE's skew-join splitting (on in every session, see session.get_spark)
handles skew it can SEE: oversized shuffle partitions of a sort-merge
join. It cannot help when the skew is algorithmic — a hot key that is hot
on BOTH sides explodes multiplicatively no matter how partitions are
split. Salting is the classic rewrite: fan the big side's hot key out over
`salt_factor` sub-keys and replicate the small side's matching rows across
every sub-key, so the hot key's work spreads over `salt_factor` tasks.

The returned plan is a plain equi-join on (key, salt) — bucketable,
AQE-compatible, no custom partitioner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, MapType, StructType


def _hashable(dt: DataType) -> bool:
    """xxhash64 rejects MapType (spark.sql.legacy.allowHashOnMapType is
    off by default), including maps nested inside structs."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    elem = getattr(dt, "elementType", None)
    return elem is None or _hashable(elem)


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side salted.

    big rows get a deterministic salt in [0, salt_factor): xxhash64 over
    every HASHABLE column (maps are skipped — Spark's hash rejects
    MapType), so the salt depends only on row content — reruns with a
    different partition count or file layout assign identical salts (a
    partition-dependent uniquifier like monotonically_increasing_id would
    not). Exact duplicate rows share a salt; that only re-concentrates
    load if the hot key's rows are near-all identical, in which case raise
    salt_factor or dedup first. Small rows are replicated once per salt via
    a literal explode. Join columns other than ``on`` keep their origin
    side's names, as with a normal equi-join.

    Only inner/left joins make sense here (the replicated small side would
    duplicate right-outer rows)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    hashable = [f.name for f in big.schema.fields if _hashable(f.dataType)]
    if on not in hashable:
        raise ValueError(f"join key {on!r} has an unhashable type")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in hashable]), F.lit(salt_factor)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")
