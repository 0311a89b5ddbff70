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

    fact gets salt = pmod(xxhash64(all fact cols' stable surrogate), K)
    — we use a random-free deterministic spread over the join key plus
    a row-local component (monotonically_increasing_id is avoided: not
    stable across retries; instead hash the full row's first non-key
    column when present, else use spark_partition_id()).

    dim is exploded K× (dim is small by construction — this is a
    dimension join), so every (key, salt) pair exists on the build side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    non_key = [c for c in fact.columns if c not in on]
    # Deterministic per-row spread: hash key cols + first non-key col.
    spread_cols = [F.col(c) for c in on] + ([F.col(non_key[0])] if non_key else [])
    salted_fact = fact.withColumn(_SALT, F.pmod(F.xxhash64(*spread_cols), F.lit(num_salts)).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias(_SALT)
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, on=[*on, _SALT], how=how)
    return out.drop(_SALT)
