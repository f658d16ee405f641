"""Golden-output parity with the reference's stream-mechanics tests.

Mirrors PinionSystemTest.java:78-145 / GearBoxTest.java:176-212
(SURVEY.md §2.4): equal gears zip positionally ([0,2,4]), unequal gears
restart the smaller ([0,2,4,3,5,7]), GearBox interleaves pinions onto
one stream.
"""

from pyspark.sql import functions as F

from movement_spark.operators.mechanics import (
    gear_box, pinion_zip, slip_wheel, zip_matched, zip_uneven,
)


def _seq(spark, vals, col="v"):
    return spark.createDataFrame([(v,) for v in vals], [col])


def test_equal_gears_zip_positionally(spark):
    """PinionSystemTest: gears [0,1,2] x [2,3,4] -> sums [2,4,6]
    (element-wise meeting points)."""
    a = _seq(spark, [0, 1, 2])
    b = _seq(spark, [2, 3, 4], col="w")
    out = zip_matched(a, b, "v", "w").select(
        (F.col("v") + F.col("w")).alias("s")).orderBy("s")
    assert [r.s for r in out.collect()] == [2, 4, 6]


def test_unequal_gears_restart_smaller(spark):
    """The reference's gear restart: A of size 6 against B of size 3 —
    B restarts, so A meets B twice over ([0,2,4] then [3,5,7] pattern:
    a_i + b_{i mod 3})."""
    a = _seq(spark, [0, 1, 2, 3, 4, 5])
    b = _seq(spark, [0, 1, 2], col="w")
    out = pinion_zip(a, b, "v", "w").select("gpos", (F.col("v") + F.col("w")).alias("s"))
    got = [r.s for r in out.orderBy("gpos").collect()]
    assert got == [0, 2, 4, 3, 5, 7]


def test_partial_rotation_allowed(spark):
    """Partial rotations: A size 4, B size 3 — last meeting uses B[0]
    again mid-rotation (PinionSystemTest partial-rotation case)."""
    a = _seq(spark, [0, 1, 2, 3])
    b = _seq(spark, [0, 1, 2], col="w")
    got = [r.s for r in pinion_zip(a, b, "v", "w")
           .select("gpos", (F.col("v") + F.col("w")).alias("s"))
           .orderBy("gpos").collect()]
    assert got == [0, 2, 4, 3]


def test_zip_uneven_is_outer(spark):
    a = _seq(spark, [10, 11, 12])
    b = _seq(spark, [20], col="w")
    rows = zip_uneven(a, b, "v", "w").orderBy("pos").collect()
    assert len(rows) == 3
    assert rows[0].v == 10 and rows[0].w == 20
    assert rows[1].w is None and rows[2].w is None


def test_slip_wheel_one_to_k(spark):
    """SlipWheel: each A element meets notchesToSlip consecutive B
    elements (SlipWheel.java:35-44)."""
    a = _seq(spark, [0, 1])
    b = _seq(spark, [0, 1, 2, 3, 4, 5], col="w")
    out = slip_wheel(a, b, "v", "w", notches=3)
    got = sorted((r.v, r.w) for r in out.collect())
    assert got == [(0, 0), (0, 1), (0, 2), (1, 3), (1, 4), (1, 5)]


def test_gear_box_interleaves(spark):
    """GearBox flatMaps pinion outputs onto one stream
    (GearBoxTest.java:176-212): all elements from all pinions, no loss."""
    p1 = _seq(spark, [1, 2])
    p2 = _seq(spark, [3, 4])
    p3 = _seq(spark, [5])
    out = gear_box([p1, p2, p3])
    assert sorted(r.v for r in out.collect()) == [1, 2, 3, 4, 5]


def test_cyclic_replay_golden(spark):
    """CyclicStreamTest.java:22-50: a 3-element wheel pulled 5 times
    yields [0,1,2,0,1] and ONE completed rotation; pulled 2 times, zero."""
    from movement_spark.operators.mechanics import CyclicReplay
    df = spark.range(3).select(F.col("id").alias("v"))
    rep = CyclicReplay(df, "v")
    assert [r.v for r in rep.take(5).orderBy("tick").collect()] == [0, 1, 2, 0, 1]
    assert rep.completed_rotations(5) == 1
    assert rep.completed_rotations(2) == 0
    assert rep.completed_rotations(3) == 0  # exactly one turn, none restarted
    assert rep.starts(5) == 2


def test_pinion_odometers_follow_consumption():
    """PinionSystem.java:46-47: odometers count per-element consumption;
    through the 1-notch slip wheel both gears consume |A|×rotations."""
    from movement_spark.operators.mechanics import pinion_odometers
    od = pinion_odometers(6, 4, rotations=2)
    assert od == {"odometer_a": 12, "odometer_b": 12,
                  "a_completed_rotations": 1, "b_completed_rotations": 2}


def test_cyclic_replay_rejects_empty_wheel(spark):
    import pytest

    from movement_spark.operators.mechanics import CyclicReplay
    from pyspark.sql import functions as F

    empty = spark.range(0).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="non-empty wheel"):
        CyclicReplay(empty, "x")
