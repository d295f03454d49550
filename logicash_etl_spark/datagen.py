"""Deterministic dirty-data generator — Spark-native.

Reproduces the reference generator's *semantics* (data_gen/generator.py:
seed=42; 50 ATMs; 10,000 transactions over ~24 months; 1% null FK, 1%
future dates (2030-2035), 2% negative amounts; categorical weights
estado 92/5/3, tipo 80/20, status 90/5/5; amounts 10.00-8000.00 as
Decimal(randint)/100) but generates WITH SPARK, not pandas+Faker: every
column is a deterministic JVM expression over ``spark.range`` — so the
same code generates 10^4 rows locally or 10^10 on a cluster, seeded and
reproducible, with no driver-side materialization.

Randomness: xxhash64(id, seed, tag) -> uniform in [0,1) via positive
modulo — stable across partitioning, unlike rand() whose value depends
on partition layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

M = 1_000_000_007


def _u(seed: int, tag: int, id_col: Column = None) -> Column:
    """Deterministic uniform [0,1) per row from (id, seed, tag)."""
    c = id_col if id_col is not None else F.col("id")
    return (F.pmod(F.xxhash64(c, F.lit(seed), F.lit(tag)), F.lit(M))) / F.lit(float(M))


def _choice(u: Column, values: list[str], weights: list[int]) -> Column:
    """Weighted categorical pick from a uniform."""
    total = sum(weights)
    expr = None
    acc = 0
    for v, w in zip(values, weights):
        acc += w
        cond = u < acc / total
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(values[-1])


def gen_dim_atms(spark: SparkSession, n: int = 50, seed: int = 42) -> DataFrame:
    """dim_atms: ATM-001..ATM-{n}, Lima bounding-box lat/lon, capacity
    in {100k,500k,1M}, model, estado 92/5/3 (generator.py:58-104)."""
    base = spark.range(1, n + 1)
    return base.select(
        F.format_string("ATM-%03d", F.col("id")).alias("id_atm"),
        F.concat(F.lit("Av. Principal "), F.col("id"), F.lit(", Lima")).alias("ubicacion"),
        F.round(F.lit(-12.20) + _u(seed, 1) * 0.30, 6).alias("latitud"),
        F.round(F.lit(-77.15) + _u(seed, 2) * 0.25, 6).alias("longitud"),
        _choice(_u(seed, 3), ["100000", "500000", "1000000"], [1, 1, 1])
        .cast("long")
        .alias("capacidad_maxima"),
        _choice(_u(seed, 4), ["NCR", "Diebold", "Hyosung", "Wincor Nixdorf"], [1, 1, 1, 1]).alias(
            "modelo"
        ),
        _choice(_u(seed, 5), ["OPERATIVO", "MANTENIMIENTO", "FUERA_DE_SERVICIO"], [92, 5, 3]).alias(
            "estado"
        ),
    )


def gen_fact_transactions(
    spark: SparkSession,
    n: int = 10_000,
    n_atms: int = 50,
    seed: int = 42,
    as_of: str = "2026-01-01 00:00:00",
    null_fk_rate: float = 0.01,
    future_rate: float = 0.01,
    negative_rate: float = 0.02,
) -> DataFrame:
    """fact_transactions with the reference's injected dirt
    (generator.py:106-175). ``as_of`` anchors the 730-day window so
    generation is reproducible (the reference anchors to run time)."""
    base = spark.range(n)
    anchor = F.to_timestamp(F.lit(as_of))
    # uniform timestamp in [as_of - 730d, as_of); 1% flipped to 2030-2035
    back_secs = (_u(seed, 10) * (730 * 24 * 3600)).cast("long")
    normal_ts = F.timestamp_seconds(F.unix_timestamp(anchor) - back_secs)
    future_ts = F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp(F.lit("2030-01-01 00:00:00")))
        + (_u(seed, 11) * (5 * 365 * 24 * 3600)).cast("long")
    )
    # amount: Decimal(randint(1000, 800000))/100 -> 10.00..8000.00; 2% negated
    cents = (F.lit(1000) + (_u(seed, 12) * F.lit(799_000)).cast("long")).cast("decimal(18,0)")
    amount = (cents / 100).cast("decimal(18,2)")
    return base.select(
        F.concat(F.lit("TX-"), F.format_string("%08d", F.col("id"))).alias("id_transaccion"),
        F.when(
            _u(seed, 13) < null_fk_rate, F.lit(None).cast("string")
        )
        .otherwise(
            F.format_string("ATM-%03d", (_u(seed, 14) * n_atms).cast("int") + 1)
        )
        .alias("id_atm"),
        F.when(_u(seed, 15) < future_rate, future_ts).otherwise(normal_ts).alias("fecha"),
        F.when(_u(seed, 16) < negative_rate, -amount).otherwise(amount).alias("monto"),
        _choice(_u(seed, 17), ["RETIRO", "DEPOSITO"], [80, 20]).alias("tipo_movimiento"),
        _choice(_u(seed, 18), ["EXITOSA", "FALLIDA", "REVERSADA"], [90, 5, 5]).alias(
            "status_transaccion"
        ),
    )


def write_lot(
    spark: SparkSession,
    out_dir: str,
    n_atms: int = 50,
    n_tx: int = 10_000,
    seed: int = 42,
    as_of: str = "2026-01-01 00:00:00",
) -> dict[str, str]:
    """Write a raw CSV lot + ``_READY`` completeness flag — the
    reference's lot-trigger convention (generator.py:177-192): files
    land first, the flag lands last, consumers trigger on the flag.
    """
    dim_path = f"{out_dir}/dim_atms"
    fact_path = f"{out_dir}/fact_transactions"
    gen_dim_atms(spark, n_atms, seed).coalesce(1).write.mode("overwrite").option(
        "header", "true"
    ).csv(dim_path)
    gen_fact_transactions(spark, n_tx, n_atms, seed, as_of).write.mode("overwrite").option(
        "header", "true"
    ).csv(fact_path)
    ready = f"{out_dir}/_READY"
    with open(ready, "w") as fh:
        fh.write("ok\n")
    return {"dim_atms": dim_path, "fact_transactions": fact_path, "ready": ready}
