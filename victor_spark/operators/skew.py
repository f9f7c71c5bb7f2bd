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


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side salted.

    big rows get a deterministic salt in [0, salt_factor) (hash of the full
    row's key + a per-row uniquifier is unnecessary — any spread works, and
    a *deterministic* spread keeps reruns identical); small rows are
    replicated once per salt via a literal explode. Join columns other than
    ``on`` keep their origin side's names, as with a normal equi-join.

    Only inner/left joins make sense here (the replicated small side would
    duplicate right-outer rows)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(salt_factor)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")
