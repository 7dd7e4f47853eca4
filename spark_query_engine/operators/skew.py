"""Skew-mitigation joins: explicit key salting.

AQE's skew-join handling (on in session.py) splits oversized shuffle
partitions at runtime, but it only fires on sort-merge joins and after
a shuffle materializes. Explicit salting is the portable, plan-level
alternative: split each hot key into ``salt`` sub-keys on the big
side, replicate the small side once per sub-key, and join on
(key, salt). Row multiplicity is unchanged — the salted join returns
exactly the rows of the plain join (the oracle checks this), it just
spreads one hot key's rows over ``salt`` reducers.

Cost model: big side gains one narrow column; small side is replicated
×salt (fine when small ≪ big — the usual skew shape: a fact table hot
on a handful of dimension keys). Use when one key holds ≳1 partition's
worth of rows; prefer plain broadcast when the small side fits in
memory (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` distributing each key over ``salt``
    reducers.

    The big side's salt is derived from a row hash (any per-row
    spread works — it never affects which rows match, only which
    reducer handles them); the small side explodes a 0..salt-1 array
    so every (key, salt) bucket finds its match. Output columns =
    big's ++ small's, duplicates and semantics identical to
    ``big.join(small, big[big_key] == small[small_key], how)``.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full would emit each UNMATCHED small-side replica once
        # per salt value — semantics change; refuse instead
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return joined.drop("_salt")
