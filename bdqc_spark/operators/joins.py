"""Join strategies beyond what a single `.join()` call expresses.

`salted_join` (SURVEY.md §2.B J7) handles hot-key skew that AQE's
skew-join splitting can't: when the *build* side must be replicated
per salt so that one hot key's rows spread across K reducers. Our
corpus has 80% of rows in one codec (FIXTURES.md), so a plain
shuffle join on `codec` puts 80% of the table in one task.

Correctness contract: salted_join(df, dim, keys, K) ≡ df.join(dim,
keys) — verified by an oracle-checked query (same result as the
unsalted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, explode the dim side.

    fact gets salt = pmod(xxhash64(partition_id, key cols, ALL hashable
    non-key cols), K) — random-free and stable across task retries
    (monotonically_increasing_id is avoided: not stable across retries;
    spark_partition_id() is, for a deterministic input partitioning).
    Hashing every non-key column (not just the first — r3 ADVICE: a
    low-cardinality first payload column pinned a hot key to ≤|distinct|
    salts) plus the partition id means even fully-duplicated hot-key
    rows spread across salts as long as they span input partitions.

    dim is exploded K× (dim is small by construction — this is a
    dimension join), so every (key, salt) pair exists on the build side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    # Hash everything hashable; map columns aren't xxhash64-able.
    hashable = [
        f.name for f in fact.schema.fields if not f.dataType.typeName().startswith("map")
    ]
    spread_cols = [F.spark_partition_id()] + [F.col(c) for c in hashable]
    salted_fact = fact.withColumn(_SALT, F.pmod(F.xxhash64(*spread_cols), F.lit(num_salts)).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias(_SALT)
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, on=[*on, _SALT], how=how)
    return out.drop(_SALT)
