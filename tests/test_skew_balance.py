"""Reducer-level skew evidence: salting is equality-tested in
test_similarity*; this asserts the BALANCE it buys on a Zipf-extreme
fixture (bench.skew_evidence — the same probe the bench reports).

The plain self-join puts a hot term's quadratic pair work on ONE
reducer (max/median in the hundreds on the fixture); the salted join
spreads it so the max partition stays within a small factor of the
median. The salted bound tracks the auto_hot_df_threshold design: a
term is left unsalted while its pair work is under ~4x the mean
per-partition work, so max/median lands well under 10 where plain is
two orders of magnitude above."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_salted_join_reducer_balance(spark):
    import bench

    out = bench.skew_evidence(spark)
    assert out["plain_max_over_median"] >= 20.0, out
    assert out["salted_max_over_median"] <= 8.0, out
    assert (
        out["salted_max_over_median"] * 10.0 <= out["plain_max_over_median"]
    ), out
    # the salt must not change the pair count (full equality is proven
    # bit-identically in test_similarity; the probe re-checks counts)
    assert out["n_pairs"] > 1_000_000
