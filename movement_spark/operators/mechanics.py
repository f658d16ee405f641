"""Stream mechanics: the reference's zip algebra, keyed Spark-first.

The reference's only join-like primitives are positional zips of pull
streams (SURVEY.md §2.4): zipMatched (inner), zipUneven (outer),
PinionSystem (two cyclic gears, smaller restarts), SlipWheel (1→k),
GearBox (flatMap of pinions). Positional iteration is inherently
sequential; the Spark-first re-expression assigns explicit positions
(row_number over a defined order — or better, a natural ordinal carried
by the data) and joins on position, which distributes.

Golden semantics preserved (PinionSystemTest.java:78-145):
  equal gears zip positionally; unequal gears RESTART the smaller one
  (position modulo the smaller size); partial rotations allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def with_pos(df: DataFrame, order_col: str, pos_col: str = "pos") -> DataFrame:
    """Assign 0-based positions by an explicit order (the distributed
    stand-in for pull-stream arrival order — which the reference never
    guarantees across threads either; its tests fix order by using a
    single gear thread)."""
    w = Window.orderBy(order_col)
    return df.withColumn(pos_col, F.row_number().over(w) - 1)


def zip_matched(a: DataFrame, b: DataFrame, order_a: str, order_b: str) -> DataFrame:
    """Inner positional zip (SequenceUtil.zipMatched:41-45)."""
    pa = with_pos(a, order_a)
    pb = with_pos(b, order_b).withColumnRenamed("pos", "pos_b")
    return pa.join(pb, pa.pos == pb.pos_b, "inner").drop("pos_b")


def zip_uneven(a: DataFrame, b: DataFrame, order_a: str, order_b: str) -> DataFrame:
    """Outer positional zip — both sides run to exhaustion, absent
    positions are NULL (SequenceUtil.zipUneven:34-39)."""
    pa = with_pos(a, order_a)
    pb = with_pos(b, order_b).withColumnRenamed("pos", "pos_b")
    return pa.join(pb, pa.pos == pb.pos_b, "full").withColumn(
        "pos", F.coalesce("pos", "pos_b")).drop("pos_b")


def pinion_zip(a: DataFrame, b: DataFrame, order_a: str, order_b: str,
               rotations: int = 1) -> DataFrame:
    """PinionSystem: gear A runs ``rotations`` full turns; gear B
    restarts whenever it is exhausted (PinionSystem.java:104-113).

    Implemented as: repeat A per rotation (explode over rotation ids),
    then join B on (global A position) % |B| — the modular restart is
    algebra, not iteration, so it distributes with no cyclic state.
    """
    size_b = b.count()
    pa = with_pos(a, order_a)
    pa = (
        pa.withColumn("rot", F.explode(F.expr(f"sequence(0, {rotations - 1})")))
        .withColumn("gpos", F.col("rot") * F.lit(a.count()) + F.col("pos"))
    )
    pb = with_pos(b, order_b).withColumnRenamed("pos", "pos_b")
    return (
        pa.withColumn("pos_mod", F.col("gpos") % size_b)
        .join(pb, F.col("pos_mod") == pb.pos_b, "inner")
        .drop("pos_b", "pos_mod")
    )


def slip_wheel(a: DataFrame, b: DataFrame, order_a: str, order_b: str,
               notches: int) -> DataFrame:
    """SlipWheel: one A element meets ``notches`` consecutive B elements
    (SlipWheel.java:35-44) — a 1→k positional band join."""
    pa = with_pos(a, order_a)
    pb = with_pos(b, order_b).withColumnRenamed("pos", "pos_b")
    cond = (pb.pos_b >= pa.pos * notches) & (pb.pos_b < (pa.pos + 1) * notches)
    return pa.join(pb, cond, "inner")


def gear_box(pinions: list[DataFrame]) -> DataFrame:
    """GearBox: flatMap N pinion outputs onto one stream
    (GearBox.java:49-56) — unionByName, done when all complete."""
    out = pinions[0]
    for p in pinions[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
